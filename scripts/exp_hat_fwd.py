"""A/B variants of the hat-DCN forward kernel (standalone, TPU)."""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C, Cout, G, K = 32, 38, 38, 1024, 512, 4, 9
Cg = C // G
HW = H * W
P = HW
TP = 128
Pp = -(-P // TP) * TP


def grid_rows():
    q = jax.lax.broadcasted_iota(jnp.int32, (1, HW), 1).astype(jnp.float32)
    qy = jnp.floor(q / float(W))
    qx = q - qy * float(W)
    return qy, qx


def hats(py_col, px_col, qy, qx):
    ay = jnp.maximum(0.0, 1.0 - jnp.abs(py_col - qy))
    bx = jnp.maximum(0.0, 1.0 - jnp.abs(px_col - qx))
    return ay, bx


# V1: current main (scratch sampled_all, one big matmul)
def k_v1(py_ref, px_ref, m_ref, xf_ref, w_ref, out_ref, samp_ref):
    py, px, m = py_ref[0, 0], px_ref[0, 0], m_ref[0, 0]
    xf = xf_ref[0, 0]
    qy, qx = grid_rows()
    for k in range(K):
        ay, bx = hats(py[:, k:k + 1], px[:, k:k + 1], qy, qx)
        s = (ay * bx * m[:, k:k + 1]).astype(jnp.bfloat16)
        samp = jnp.dot(s, xf, preferred_element_type=jnp.float32)
        samp_ref[:, k * Cg:(k + 1) * Cg] = samp.astype(jnp.bfloat16)
    out_ref[0, 0] = jnp.dot(samp_ref[:], w_ref[0],
                            preferred_element_type=jnp.float32)


# V2: per-tap accumulate, no scratch
def k_v2(py_ref, px_ref, m_ref, xf_ref, w_ref, out_ref):
    py, px, m = py_ref[0, 0], px_ref[0, 0], m_ref[0, 0]
    xf = xf_ref[0, 0]
    qy, qx = grid_rows()
    acc = jnp.zeros((TP, Cout), jnp.float32)
    for k in range(K):
        ay, bx = hats(py[:, k:k + 1], px[:, k:k + 1], qy, qx)
        s = (ay * bx * m[:, k:k + 1]).astype(jnp.bfloat16)
        samp = jnp.dot(s, xf, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(samp.astype(jnp.bfloat16),
                            w_ref[0, k * Cg:(k + 1) * Cg],
                            preferred_element_type=jnp.float32)
    out_ref[0, 0] = acc


# V3: stacked S (one [K*TP, HW] matmul), scratch for S
def k_v3(py_ref, px_ref, m_ref, xf_ref, w_ref, out_ref, s_ref):
    py, px, m = py_ref[0, 0], px_ref[0, 0], m_ref[0, 0]
    xf = xf_ref[0, 0]
    qy, qx = grid_rows()
    for k in range(K):
        ay, bx = hats(py[:, k:k + 1], px[:, k:k + 1], qy, qx)
        s_ref[k * TP:(k + 1) * TP, :] = (
            ay * bx * m[:, k:k + 1]).astype(jnp.bfloat16)
    samp = jnp.dot(s_ref[:], xf,
                   preferred_element_type=jnp.float32)  # [K*TP, Cg]
    # [K*TP, Cg] -> want sum_k samp_k @ w_k; do per-slice matmuls
    acc = jnp.zeros((TP, Cout), jnp.float32)
    for k in range(K):
        acc = acc + jnp.dot(
            samp[k * TP:(k + 1) * TP].astype(jnp.bfloat16),
            w_ref[0, k * Cg:(k + 1) * Cg],
            preferred_element_type=jnp.float32)
    out_ref[0, 0] = acc


# V4: V2 with bf16 hat construction (cast py/m once, hats in bf16)
def k_v4(py_ref, px_ref, m_ref, xf_ref, w_ref, out_ref):
    py, px, m = py_ref[0, 0], px_ref[0, 0], m_ref[0, 0]
    xf = xf_ref[0, 0]
    qy, qx = grid_rows()
    acc = jnp.zeros((TP, Cout), jnp.float32)
    for k in range(K):
        ay = jnp.maximum(0.0, 1.0 - jnp.abs(py[:, k:k + 1] - qy)).astype(
            jnp.bfloat16)
        bx = jnp.maximum(0.0, 1.0 - jnp.abs(px[:, k:k + 1] - qx)).astype(
            jnp.bfloat16)
        s = ay * bx * m[:, k:k + 1].astype(jnp.bfloat16)
        samp = jnp.dot(s, xf, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(samp.astype(jnp.bfloat16),
                            w_ref[0, k * Cg:(k + 1) * Cg],
                            preferred_element_type=jnp.float32)
    out_ref[0, 0] = acc


def build(kernel, scratch):
    specs = [
        pl.BlockSpec((1, 1, TP, K), lambda b, g, t: (b, g, t, 0)),
        pl.BlockSpec((1, 1, TP, K), lambda b, g, t: (b, g, t, 0)),
        pl.BlockSpec((1, 1, TP, K), lambda b, g, t: (b, g, t, 0)),
        pl.BlockSpec((1, 1, HW, Cg), lambda b, g, t: (b, g, 0, 0)),
        pl.BlockSpec((1, K * Cg, Cout), lambda b, g, t: (g, 0, 0)),
    ]

    def f(py, px, m, xf, wg):
        out = pl.pallas_call(
            kernel,
            grid=(B, G, Pp // TP),
            in_specs=specs,
            out_specs=pl.BlockSpec((1, 1, TP, Cout),
                                   lambda b, g, t: (b, g, t, 0)),
            out_shape=jax.ShapeDtypeStruct((B, G, Pp, Cout), jnp.float32),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=48 * 1024 * 1024),
        )(py, px, m, xf, wg)
        return jnp.sum(out, axis=1)

    return f


def timeit(fn, args, iters=20):
    f = jax.jit(lambda c, *a: jnp.sum(fn(a[0] + c, *a[1:])) * 1e-9)
    c = jnp.zeros((), jnp.float32)
    c = f(c, *args)
    float(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = f(c * 1e-30, *args)
    float(c)
    return (time.perf_counter() - t0) / iters * 1000


rng = np.random.default_rng(0)
py = jnp.asarray(rng.uniform(0, 37, (B, G, Pp, K)), jnp.float32)
px = jnp.asarray(rng.uniform(0, 37, (B, G, Pp, K)), jnp.float32)
m = jnp.asarray(rng.uniform(0, 1, (B, G, Pp, K)), jnp.float32)
xf = jnp.asarray(rng.normal(size=(B, G, HW, Cg)), jnp.bfloat16)
wg = jnp.asarray(rng.normal(size=(G, K * Cg, Cout)) * 0.05, jnp.bfloat16)

variants = {
    "v1 scratch+bigmm": build(k_v1, [pltpu.VMEM((TP, K * Cg), jnp.bfloat16)]),
    "v2 per-tap acc": build(k_v2, []),
    "v3 stacked-S": build(k_v3, [pltpu.VMEM((K * TP, HW), jnp.bfloat16)]),
    "v4 bf16 hats": build(k_v4, []),
}
ref = None
for name, f in variants.items():
    out = np.asarray(jax.jit(f)(py, px, m, xf, wg))
    if ref is None:
        ref = out
    else:
        err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
        print(f"{name}: rel err vs v1 = {err:.4f}")
    ms = timeit(f, (py, px, m, xf, wg))
    print(f"{name:20s}: {ms:7.2f} ms")
