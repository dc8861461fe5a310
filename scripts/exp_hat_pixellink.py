"""hat-DCN at the PixelLink site shape (75x75, 256ch, G=4 -> Cg=64):
numeric cross-check vs the XLA reference impl + timing vs 'fused'."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from gssd_tpu.ops.deform_conv import DCN

B, H, C, COUT, G = 8, 75, 256, 256, 4


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


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    z = jnp.ones((128, 128))
    chain_time(lambda c, a: jnp.sum(a * (1 + c)) * 1e-9, (z,), iters=30)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, H, C)), jnp.bfloat16)
    om_w = None  # same offset-conv weights for every impl
    outs = {}
    for impl in ("hat", "xla"):
        mod = DCN(features=COUT, deformable_groups=G, dtype=jnp.bfloat16,
                  impl=impl)
        v = mod.init(jax.random.PRNGKey(0), x)
        # nonzero offsets: perturb the zero-init offset conv
        v = jax.tree_util.tree_map(lambda a: a, v)
        import flax

        p = flax.core.unfreeze(v["params"]) if hasattr(
            flax.core, "unfreeze") else dict(v["params"])
        if om_w is None:
            om_w = jnp.asarray(
                rng.normal(size=np.shape(
                    v["params"]["conv_offset_mask"]["kernel"])) * 0.05,
                jnp.float32)
        p["conv_offset_mask"]["kernel"] = om_w
        v = {"params": p}
        out, _ = jax.jit(lambda v, x: mod.apply(v, x))(v, x)
        outs[impl] = np.asarray(out, np.float32)

        def fwdbwd(c, params, x):
            def loss_fn(args):
                pp, xi = args
                o, _ = mod.apply({"params": pp}, xi + c.astype(xi.dtype))
                return jnp.mean(jnp.square(o.astype(jnp.float32)))

            val, grads = jax.value_and_grad(loss_fn)((params, x))
            gs = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                     for g in jax.tree_util.tree_leaves(grads))
            return val + gs * 1e-30

        ms = chain_time(fwdbwd, (v["params"], x))
        print(f"{impl:6s}: fwd+bwd {ms:7.2f} ms", flush=True)

    for impl in ("hat",):
        err = np.abs(outs[impl] - outs["xla"]).max() / max(
            np.abs(outs["xla"]).max(), 1e-6)
        print(f"{impl} vs xla rel err: {err:.4f}")
