"""Per-stage timing of the GSSD base model (where do 117 ms/step go?).

Times fwd+bwd of each backbone stage at batch 32 with the chained-
scalar pattern, plus single-layer probes (grouped vs dense conv, BN
dtype) to locate the MXU/HBM bottleneck of the non-DCN trunk.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gssd_tpu.config import LossConfig, ModelConfig, OptimConfig
from gssd_tpu.models import build_model
from gssd_tpu.ops.layers import ConvBNRelu, max_pool
from gssd_tpu.train import create_train_state, make_train_step

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
    print(f"{name:44s}: {ms:8.2f} ms", flush=True)


def rand(*shape, dtype=jnp.bfloat16, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(-1, 1, shape), dtype=dtype)


def fwdbwd(mod, x):
    variables = mod.init(jax.random.PRNGKey(0), x, True)

    def f(c, variables, x):
        def loss_fn(v):
            out = mod.apply(v, x + c.astype(x.dtype), True,
                            mutable=["batch_stats"])
            if isinstance(out, tuple):
                out = out[0]
            return jnp.mean(jnp.square(out.astype(jnp.float32)))

        val, grads = jax.value_and_grad(loss_fn)(variables)
        gs = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                 for g in jax.tree_util.tree_leaves(grads))
        return val + gs * 1e-30

    return f, (variables, x)


class Stage(nn.Module):
    """A run of ConvBNRelu layers + pools, mirroring the SSD trunk."""

    plan: tuple  # elements: int channels or 'M'/'C'
    groups: int = 4
    dtype: object = jnp.bfloat16
    bn_dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        for i, v in enumerate(self.plan):
            if v == "M":
                x = max_pool(x, 2, 2)
            elif v == "C":
                x = max_pool(x, 2, 2, ceil_mode=True)
            else:
                x = nn.Conv(v, (3, 3), padding=[(1, 1)] * 2,
                            feature_group_count=self.groups,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"c{i}")(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.bn_dtype,
                                 name=f"bn{i}")(x)
                x = nn.relu(x.astype(self.dtype))
        return x


def _warmup():
    z = rand(128, 128, dtype=jnp.float32)
    chain_time(lambda c, a: jnp.sum(a * (1 + c)) * 1e-9, (z,), iters=30)


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    _warmup()

    # reference point: full gssd train step
    cfg = ModelConfig()
    model, priors = build_model(cfg)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 300, 300, 12)), OptimConfig())
    step = make_train_step(model, priors, LossConfig(), OptimConfig())
    batch = {
        "image": rand(B, 300, 300, 12, dtype=jnp.float32),
        "boxes": jnp.tile(jnp.asarray([0.3, 0.3, 0.6, 0.6], jnp.float32),
                          (B, 1, 1)),
        "labels": jnp.zeros((B, 1), jnp.int32),
        "valid": jnp.ones((B, 1), bool),
    }

    def fstep(c, state, batch):
        b = dict(batch)
        b["image"] = b["image"] + c
        _, m = step(state, b)
        return m["loss"].astype(jnp.float32)

    report("gssd full step", chain_time(fstep, (state, batch)))

    # stages
    s1a = Stage(plan=(64, 64))                       # 300^2
    report("stage 300^2 (c1_1,c1_2)",
           chain_time(*fwdbwd(s1a, rand(B, 300, 300, 12))))
    s1b = Stage(plan=(128, 128))                     # 150^2
    report("stage 150^2 (c2_x)",
           chain_time(*fwdbwd(s1b, rand(B, 150, 150, 64))))
    s1c = Stage(plan=(256, 256, 256))                # 75^2
    report("stage 75^2 (c3_x)",
           chain_time(*fwdbwd(s1c, rand(B, 75, 75, 128))))
    s1d = Stage(plan=(512, 512, 512))                # 38^2
    report("stage 38^2 (c4_x)",
           chain_time(*fwdbwd(s1d, rand(B, 38, 38, 256))))
    s2 = Stage(plan=(512, 512, 512))                 # 19^2 conv5
    report("stage 19^2 (c5_x)",
           chain_time(*fwdbwd(s2, rand(B, 19, 19, 512))))

    # single-layer probes at 300^2
    x300 = rand(B, 300, 300, 64)
    report("conv 64->64 g4 +bn32+relu @300^2",
           chain_time(*fwdbwd(ConvBNRelu(64, padding=1, groups=4,
                                         use_bn=True), x300)))
    report("conv 64->64 dense +bn32+relu @300^2",
           chain_time(*fwdbwd(ConvBNRelu(64, padding=1, groups=1,
                                         use_bn=True), x300)))
    report("conv 64->64 g4 no-bn @300^2",
           chain_time(*fwdbwd(ConvBNRelu(64, padding=1, groups=4,
                                         use_bn=False), x300)))

    class BNOnly(nn.Module):
        dtype: object = jnp.float32

        @nn.compact
        def __call__(self, x, train=True):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype)(x)

    report("bn(f32) alone @300^2x64",
           chain_time(*fwdbwd(BNOnly(), x300)))
    report("bn(bf16) alone @300^2x64",
           chain_time(*fwdbwd(BNOnly(dtype=jnp.bfloat16), x300)))
