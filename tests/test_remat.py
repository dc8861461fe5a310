"""Activation checkpointing (nn.remat) parity.

The reference wraps every PixelLink Self_Attn call in
torch.utils.checkpoint (pixel_link/model.py:203,...,296) — gradients
must be identical with recomputation on or off; only memory differs.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gssd_tpu.config import PixelLinkConfig
from gssd_tpu.models.pixellink import PixelLink
from gssd_tpu.ops.layers import SelfAttention


def test_selfattention_remat_grads_equal(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    plain = SelfAttention(dtype=jnp.float32)
    remat = nn.remat(SelfAttention, static_argnums=(2,))(dtype=jnp.float32)

    vs = plain.init(jax.random.PRNGKey(0), x, True)

    def loss(module):
        def f(params):
            (out, scaled, attn), mut = module.apply(
                {"params": params, "spectral": vs["spectral"]},
                x, True, mutable=["spectral"],
            )
            return (jnp.sum(out ** 2) + jnp.sum(attn ** 2), mut)

        return jax.value_and_grad(f, has_aux=True)(vs["params"])

    (lp, mut_p), gp = loss(plain)
    (lr, mut_r), gr = loss(remat)
    assert np.allclose(lp, lr)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6), gp, gr)
    # spectral power-iteration state updates identically too
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
        mut_p["spectral"], mut_r["spectral"])


def test_pixellink_remat_grads_equal(rng):
    cfg = PixelLinkConfig(
        version="4s", use_self_attention=True,
        use_self_attention_base=True, remat_attention=False,
    )
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 12)), jnp.float32)

    def grads(cfg):
        model = PixelLink(cfg, dtype=jnp.float32)
        vs = model.init(jax.random.PRNGKey(1), x, train=False)

        def f(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": vs["batch_stats"],
                 "spectral": vs["spectral"]},
                x, train=True, mutable=["batch_stats", "spectral"],
            )
            return jnp.sum(out["pixel"] ** 2) + jnp.sum(out["link"] ** 2)

        return vs, jax.grad(f)(vs["params"])

    vs_a, ga = grads(cfg)
    vs_b, gb = grads(dataclasses.replace(cfg, remat_attention=True))
    # identical init (remat does not change the param tree)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b), vs_a["params"],
        vs_b["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5), ga, gb)
