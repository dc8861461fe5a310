"""Pallas stem-conv variants: find a patch/matmul structure Mosaic
executes fast (the v1 scratch-staged im2col ran at 6 TF/s — misaligned
lane stores dominate).

Variants (fwd only, conv1_2 site: 300^2, 64->64, b32):
  A scratch-staged im2col (current kernel, baseline)
  C per-tap dot accumulate (9 dots K=64, operand relayouts, no scratch)
  D dy-concat (free, major dim) -> 3 dots over dx shifts (K=192)
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C, Cout = 32, 300, 300, 64, 64
R = 20


def chain_time(f, args, iters=20):
    g = jax.jit(f)
    c = jnp.zeros((), jnp.float32)
    c = g(c, *args)
    float(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = g(c * 1e-30, *args)
    float(c)
    return (time.perf_counter() - t0) / iters * 1000


def rand(*shape, dtype=jnp.bfloat16, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(-1, 1, shape).astype(np.float32),
        dtype)


def _halo(x_ref, r0):
    mid = x_ref[0, pl.ds(r0, R)]
    top = x_ref[0, pl.ds(jnp.maximum(r0 - 1, 0), 1)]
    top = jnp.where(r0 > 0, top, jnp.zeros_like(top))
    bot = x_ref[0, pl.ds(jnp.minimum(r0 + R, H - 1), 1)]
    bot = jnp.where(r0 + R < H, bot, jnp.zeros_like(bot))
    xr = jnp.concatenate([top, mid, bot], axis=0)  # [R+2, W, C]
    return jnp.pad(xr, ((0, 0), (1, 1), (0, 0)))  # [R+2, W+2, C]


def kernel_c(x_ref, w_ref, out_ref):
    """per-tap dot accumulate; w_ref [9, C, Cout]."""
    t = pl.program_id(1)
    xrp = _halo(x_ref, t * R)
    acc = jnp.zeros((R * W, Cout), jnp.float32)
    for k, (dy, dx) in enumerate((dy, dx) for dy in range(3)
                                 for dx in range(3)):
        xs = xrp[dy:dy + R, dx:dx + W].reshape(R * W, C)
        acc = acc + jnp.dot(xs, w_ref[k],
                            preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(R, W, Cout).astype(out_ref.dtype)


def kernel_d(x_ref, w_ref, out_ref):
    """dy-concat (major-dim shifts, no offsets) -> 3 dots over dx;
    w_ref [3, 3*C, Cout] (dx-major, [dy,ci] flattened inside)."""
    t = pl.program_id(1)
    xrp = _halo(x_ref, t * R)
    p3 = jnp.concatenate(
        [xrp[dy:dy + R] for dy in range(3)], axis=-1)  # [R, W+2, 3C]
    acc = jnp.zeros((R * W, Cout), jnp.float32)
    for dx in range(3):
        xs = p3[:, dx:dx + W].reshape(R * W, 3 * C)
        acc = acc + jnp.dot(xs, w_ref[dx],
                            preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(R, W, Cout).astype(out_ref.dtype)


def run(kernel, wshape):
    x = rand(B, H, W, C)
    w = rand(*wshape, seed=1) * 0.05

    def f(x, w):
        return pl.pallas_call(
            kernel,
            grid=(B, H // R),
            in_specs=[
                pl.BlockSpec((1, H, W, C), lambda b, t: (b, 0, 0, 0)),
                pl.BlockSpec(wshape, lambda b, t: tuple(0 for _ in wshape)),
            ],
            out_specs=pl.BlockSpec((1, R, W, Cout),
                                   lambda b, t: (b, t, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, w)

    y = jax.jit(f)(x, w)  # compile check
    ms = chain_time(
        lambda c, x, w: jnp.sum(
            f(x + c.astype(x.dtype), w).astype(jnp.float32)) * 1e-9,
        (x, w))
    gf = 2 * B * H * W * 9 * C * Cout / 1e9
    print(f"{kernel.__name__}: {ms:7.2f} ms  ({gf / ms:6.1f} TF/s)",
          flush=True)
    return y


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    z = rand(128, 128, dtype=jnp.float32)
    chain_time(lambda c, a: jnp.sum(a * (1 + c)) * 1e-9, (z,), iters=30)

    # reference output for correctness
    x = rand(B, H, W, C)
    w9 = (rand(9, C, Cout, seed=1) * 0.05)
    wg = w9.reshape(3, 3, C, Cout)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, wg.shape, ("NHWC", "HWIO", "NHWC"))
    yr = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn))(x, wg)

    yc = run(kernel_c, (9, C, Cout))
    print("C err:", float(jnp.abs(
        yc.astype(jnp.float32) - yr.astype(jnp.float32)).max()))
    # w for D: [dx, (dy, ci), co]
    wd_ = jnp.transpose(wg, (1, 0, 2, 3)).reshape(3, 3 * C, Cout)
    yd = run(kernel_d, (3, 3 * C, Cout))
    # build the same weights run() used (seed 1 reshaped differently);
    # for timing purposes correctness of D is checked structurally:
    # rebuild with matching weights
    def fd(x, w):
        return pl.pallas_call(
            kernel_d,
            grid=(B, H // R),
            in_specs=[
                pl.BlockSpec((1, H, W, C), lambda b, t: (b, 0, 0, 0)),
                pl.BlockSpec((3, 3 * C, Cout), lambda b, t: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, R, W, Cout),
                                   lambda b, t: (b, t, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, w)
    yd2 = jax.jit(fd)(x, wd_)
    print("D err:", float(jnp.abs(
        yd2.astype(jnp.float32) - yr.astype(jnp.float32)).max()))
