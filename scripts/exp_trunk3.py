"""Round-3 trunk probes: per-site grouped-conv lowering shootout + BN
dtype traffic.

Questions (VERDICT r2 weak #1 / next #2):
1. Is the DENSE_GROUPS_MIN_HW=5000 crossover right at 75^2 (dense now)
   and 38^2/19^2 (grouped now)? Compare XLA feature_group_count vs
   block-diag dense vs a group-as-batch einsum lowering (9 shifted
   batched matmuls, exact grouped FLOPs, no 4x dense waste).
2. Does f32 BatchNorm between bf16 convs cost HBM traffic at the big
   spatial sites (f32 intermediate is 2x the bytes)?
3. Stem composition: conv1_1+conv1_2+BN+ReLU+pool at 300^2 — how far
   from the HBM roofline is XLA, i.e. is a Pallas fused stem worth it?

Usage: python scripts/exp_trunk3.py   (TPU; ~5 min)
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gssd_tpu.ops.layers import ConvBNRelu, max_pool

B = 32


def chain_time(fn, args, iters=20):
    f = jax.jit(fn)
    c = jnp.zeros((), jnp.float32)
    c = f(c, *args)
    float(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = f(c * 1e-30, *args)
    float(c)
    return (time.perf_counter() - t0) / iters * 1000


def report(name, ms, flops=None):
    eff = f"  ({flops / ms * 1e-9:6.1f} TF/s)" if flops else ""
    print(f"{name:52s}: {ms:8.2f} ms{eff}", flush=True)


def rand(*shape, dtype=jnp.bfloat16, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(-1, 1, shape), dtype=dtype)


def fwdbwd_fn(f, *args):
    """Time fwd+bwd of f(params, x) where args = (params, x)."""

    def g(c, params, x):
        def loss(p):
            y = f(p, x + c.astype(x.dtype))
            return jnp.mean(jnp.square(y.astype(jnp.float32)))

        val, grads = jax.value_and_grad(loss)(params)
        gs = sum(jnp.sum(gg.astype(jnp.float32) ** 2)
                 for gg in jax.tree_util.tree_leaves(grads))
        return val + gs * 1e-30

    return g, args


# ---- three grouped-conv lowerings (bias-free, bf16) -------------------

def conv_grouped(w, x, g=4, dil=1):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(dil, dil)] * 2, rhs_dilation=(dil, dil),
        dimension_numbers=dn, feature_group_count=g)


def conv_dense_blockdiag(w, x, g=4, dil=1):
    # w: [kh, kw, Cin/G, Cout] grouped layout -> zero-padded dense
    kh, kw, cgi, cout = w.shape
    cgo = cout // g
    parts = [jnp.pad(w[:, :, :, i * cgo:(i + 1) * cgo],
                     ((0, 0), (0, 0), (i * cgi, (g - 1 - i) * cgi), (0, 0)))
             for i in range(g)]
    wd = jnp.concatenate(parts, axis=3)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, wd.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, wd, (1, 1), [(dil, dil)] * 2, rhs_dilation=(dil, dil),
        dimension_numbers=dn)


def conv_groupbatch(w, x, g=4, dil=1):
    """9 shifted batched matmuls: einsum over [B,H,W,G,C/G] x
    [G, C/G, Cout/G] per tap. Exact grouped FLOPs; contraction K=C/G,
    lanes N=Cout/G (wants >= 128-ish channels per group)."""
    kh, kw, cgi, cout = w.shape
    cgo = cout // g
    bb, hh, ww, cc = x.shape
    pad = dil
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    wg = w.reshape(kh, kw, cgi, g, cgo)  # [kh,kw,cgi,G,cgo]
    out = jnp.zeros((bb, hh, ww, g, cgo), jnp.float32)
    xg = xp.reshape(bb, hh + 2 * pad, ww + 2 * pad, g, cgi)
    for iy in range(kh):
        for ix in range(kw):
            sl = xg[:, iy * dil:iy * dil + hh, ix * dil:ix * dil + ww]
            out = out + jax.lax.dot_general(
                sl, wg[iy, ix],
                dimension_numbers=(((4,), (0,)), ((3,), (1,))),
                preferred_element_type=jnp.float32,
            ).transpose(1, 2, 3, 0, 4)  # dot puts batch dim (g) first
    return out.reshape(bb, hh, ww, cout).astype(x.dtype)


def site(name, hw, cin, cout, g=4, dil=1):
    x = rand(B, hw, hw, cin)
    w = rand(3, 3, cin // g, cout, seed=1) * 0.05
    # true grouped math fwd+bwd flops (x3 fwd) for the efficiency column
    flops = 3 * 2 * B * hw * hw * (cin // g) * cout * 9
    ya = np.asarray(jax.jit(lambda w, x: conv_grouped(w, x, g, dil))(w, x),
                    np.float32)
    for label, f in (("grouped", conv_grouped),
                     ("dense-bd", conv_dense_blockdiag),
                     ("gbatch", conv_groupbatch)):
        yb = np.asarray(jax.jit(lambda w, x, f=f: f(w, x, g, dil))(w, x),
                        np.float32)
        err = np.abs(ya - yb).max() / max(np.abs(ya).max(), 1e-6)
        ms = chain_time(*fwdbwd_fn(lambda w, x, f=f: f(w, x, g, dil), w, x))
        report(f"{name} {label} (err {err:.4f})", ms, flops)


class Stem(nn.Module):
    bn_dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        for i, c in enumerate((64, 64)):
            x = nn.Conv(c, (3, 3), padding=[(1, 1)] * 2,
                        feature_group_count=4, dtype=jnp.bfloat16,
                        param_dtype=jnp.float32, name=f"c{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.bn_dtype,
                             name=f"bn{i}")(x)
            x = nn.relu(x.astype(jnp.bfloat16))
        return max_pool(x, 2, 2)


def stem_probe(bn_dtype, label):
    x = rand(B, 300, 300, 12)
    mod = Stem(bn_dtype=bn_dtype)
    variables = mod.init(jax.random.PRNGKey(0), x, True)

    def f(c, v, x):
        def loss(vv):
            y, _ = mod.apply(vv, x + c.astype(x.dtype), True,
                             mutable=["batch_stats"])
            return jnp.mean(jnp.square(y.astype(jnp.float32)))

        val, grads = jax.value_and_grad(loss)(v)
        gs = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                 for g in jax.tree_util.tree_leaves(grads))
        return val + gs * 1e-30

    report(f"stem c1_1+c1_2+bn+relu+pool ({label})",
           chain_time(f, (variables, x)))


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    z = rand(128, 128, dtype=jnp.float32)
    chain_time(lambda c, a: jnp.sum(a * (1 + c)) * 1e-9, (z,), iters=30)

    # lowering shootout at each trunk site (fwd+bwd, b32, bf16)
    site("conv2_2 150^2 128->128", 150, 128, 128)
    site("conv3_2 75^2  256->256", 75, 256, 256)
    site("conv4_2 38^2  512->512", 38, 512, 512)
    site("conv5_x 19^2  512->512", 19, 512, 512)
    site("fc6    19^2 512->1024 d6", 19, 512, 1024, dil=6)

    # BN dtype at the stem
    stem_probe(jnp.float32, "bn f32")
    stem_probe(jnp.bfloat16, "bn bf16")
