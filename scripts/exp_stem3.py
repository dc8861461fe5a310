"""Round-3 stem breakdown: where do the stem's ms go, and which
restructuring wins?

The model's stem is conv1_1(12->64 g4) + BN + ReLU + conv1_2(64->64 g4)
+ BN + ReLU + maxpool at 300^2, lowered block-diag dense (ConvBNRelu).
Probes: each piece alone (fwd+bwd and fwd-only), BN dtype, and a
4-offset stride-2 decomposition of conv1_2 (moves the layer into a
regime XLA tiles better, same math).

Usage: python scripts/exp_stem3.py   (TPU)
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


def report(name, ms):
    print(f"{name:52s}: {ms:8.2f} ms", flush=True)


def rand(*shape, dtype=jnp.bfloat16, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(-1, 1, shape), dtype=dtype)


def fwdbwd_mod(mod, x, train=True):
    variables = mod.init(jax.random.PRNGKey(0), x, train)

    def f(c, v, x):
        def loss(vv):
            out = mod.apply(vv, x + c.astype(x.dtype), train,
                            mutable=["batch_stats"] if train else [])
            y = out[0] if isinstance(out, tuple) else out
            return jnp.mean(jnp.square(y.astype(jnp.float32)))

        val, grads = jax.value_and_grad(loss)(v)
        gs = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                 for g in jax.tree_util.tree_leaves(grads))
        return val + gs * 1e-30

    return f, (variables, x)


def fwdonly_mod(mod, x, train=True):
    variables = mod.init(jax.random.PRNGKey(0), x, train)

    def f(c, v, x):
        out = mod.apply(v, x + c.astype(x.dtype), train,
                        mutable=["batch_stats"] if train else [])
        y = out[0] if isinstance(out, tuple) else out
        return jnp.mean(jnp.square(y.astype(jnp.float32)))

    return f, (variables, x)


class ModelStem(nn.Module):
    """Exactly the model's stem composition (ConvBNRelu picks the
    block-diag dense lowering at 300^2)."""

    @nn.compact
    def __call__(self, x, train=True):
        x = ConvBNRelu(64, padding=1, groups=4, use_bn=True,
                       name="c1_1")(x, train)
        x = ConvBNRelu(64, padding=1, groups=4, use_bn=True,
                       name="c1_2")(x, train)
        return max_pool(x, 2, 2)


class BNReluPool(nn.Module):
    bn_dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.bn_dtype)(x)
        x = nn.relu(x.astype(jnp.bfloat16))
        return max_pool(x, 2, 2)


def conv12_offsets(w, x):
    """conv1_2 as 4 offset stride-2 convs: output block position
    (di, dj) of the 2x2-downsampled grids; concatenating the 4 offset
    outputs = the full 300^2 output (here consumed pre-pool, so we
    return the 4 strided maps — the model's pool 2x2 s2 aligns with the
    (di, dj) blocks, so pool = elementwise max of the 4 maps)."""
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    outs = []
    for di in (0, 1):
        for dj in (0, 1):
            # output pixel (2i+di, 2j+dj) <- rows 2i+di-1 .. 2i+di+1
            pad = [(1 - di, di), (1 - dj, dj)]
            outs.append(jax.lax.conv_general_dilated(
                x, w, (2, 2), pad, dimension_numbers=dn))
    return outs


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    z = rand(128, 128, dtype=jnp.float32)
    chain_time(lambda c, a: jnp.sum(a * (1 + c)) * 1e-9, (z,), iters=30)

    x12 = rand(B, 300, 300, 12)
    x64 = rand(B, 300, 300, 64)

    report("model stem (dense-bd, bn f32, pool)",
           chain_time(*fwdbwd_mod(ModelStem(), x12)))
    report("model stem fwd-only",
           chain_time(*fwdonly_mod(ModelStem(), x12)))
    report("conv1_1 12->64 dense-bd alone",
           chain_time(*fwdbwd_mod(
               ConvBNRelu(64, padding=1, groups=4, relu=False), x12)))
    report("conv1_2 64->64 dense-bd alone",
           chain_time(*fwdbwd_mod(
               ConvBNRelu(64, padding=1, groups=4, relu=False), x64)))
    report("conv1_2 64->64 dense-bd fwd-only",
           chain_time(*fwdonly_mod(
               ConvBNRelu(64, padding=1, groups=4, relu=False), x64)))
    class GroupedConv(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return nn.Conv(64, (3, 3), padding=[(1, 1)] * 2,
                           feature_group_count=4, dtype=jnp.bfloat16,
                           param_dtype=jnp.float32)(x)

    report("conv1_2 64->64 grouped alone",
           chain_time(*fwdbwd_mod(GroupedConv(), x64)))
    report("bn(f32)+relu+pool @300^2x64",
           chain_time(*fwdbwd_mod(BNReluPool(), x64)))
    report("bn(bf16)+relu+pool @300^2x64",
           chain_time(*fwdbwd_mod(BNReluPool(jnp.bfloat16), x64)))

    # 4-offset stride-2 decomposition of conv1_2 (+ fused 2x2 pool)
    wg = rand(3, 3, 16, 64, seed=1) * 0.05
    cgo = 16
    parts = [jnp.pad(wg[:, :, :, g * cgo:(g + 1) * cgo],
                     ((0, 0), (0, 0), (g * 16, (4 - 1 - g) * 16), (0, 0)))
             for g in range(4)]
    wd = jnp.concatenate(parts, axis=3)

    def f_ref(w, x):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
        return max_pool(y, 2, 2)

    def f_off(w, x):
        o = conv12_offsets(w, x)
        return jnp.maximum(jnp.maximum(o[0], o[1]),
                           jnp.maximum(o[2], o[3]))

    ya = np.asarray(jax.jit(f_ref)(wd, x64), np.float32)
    yb = np.asarray(jax.jit(f_off)(wd, x64), np.float32)
    print("offset-decomp err:",
          np.abs(ya - yb).max() / max(np.abs(ya).max(), 1e-6))

    def timed(f):
        def g(c, w, x):
            def loss(args):
                wi, xi = args
                y = f(wi, xi + c.astype(xi.dtype))
                return jnp.mean(jnp.square(y.astype(jnp.float32)))

            val, grads = jax.value_and_grad(loss)((w, x))
            gs = sum(jnp.sum(gg.astype(jnp.float32) ** 2)
                     for gg in jax.tree_util.tree_leaves(grads))
            return val + gs * 1e-30

        return chain_time(g, (wd, x64))

    report("conv1_2+pool dense-bd (reference)", timed(f_ref))
    report("conv1_2+pool 4-offset stride-2", timed(f_off))
