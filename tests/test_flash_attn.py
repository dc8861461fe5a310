"""Parity of the fused SAGAN attention kernel
(ops/pallas/flash_attn.py) against the plain einsum/softmax path it
replaces (ops/layers.SelfAttention; reference self_attn.py:29-89)."""

import jax
import jax.numpy as jnp
import numpy as np

from gssd_tpu.ops.pallas.flash_attn import flash_attention


def _plain(q, k, v):
    logits = jnp.einsum("bnd,bmd->bnm", q, k,
                        preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
    return jnp.einsum("bnm,bmd->bnd", attn, v)


def _rand(rng, B, N, M, dk, dv, scale=1.0):
    q = jnp.asarray(rng.normal(0, scale, (B, N, dk)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, scale, (B, M, dk)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (B, M, dv)), jnp.bfloat16)
    return q, k, v


def test_flash_forward_matches(rng):
    # flagship geometry (38^2 tokens) incl. tile padding (1444 % 256)
    q, k, v = _rand(rng, 2, 1444, 1444, 64, 32)
    want = np.asarray(_plain(q, k, v), np.float32)
    got = np.asarray(flash_attention(q, k, v), np.float32)
    np.testing.assert_allclose(got, want,
                               atol=0.01 * np.abs(want).max())


def test_flash_forward_pooled_kv(rng):
    # max_pool_factor > 1 site: M != N, M not a multiple of 128
    q, k, v = _rand(rng, 1, 330, 25, 16, 32)
    want = np.asarray(_plain(q, k, v), np.float32)
    got = np.asarray(flash_attention(q, k, v), np.float32)
    np.testing.assert_allclose(got, want,
                               atol=0.01 * max(np.abs(want).max(), 1e-3))


def test_flash_gradients_match(rng):
    q, k, v = _rand(rng, 1, 260, 130, 16, 32)

    def loss(f):
        return lambda a: jnp.sum(f(*a).astype(jnp.float32) ** 2)

    gp = jax.grad(loss(_plain))((q, k, v))
    gf = jax.grad(loss(flash_attention))((q, k, v))
    for n, a, b in zip("qkv", gp, gf):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = max(np.abs(a).max(), 1e-3)
        # dq/dk carry softmax-VJP cancellation noise at bf16 precision
        np.testing.assert_allclose(b / denom, a / denom, atol=0.03,
                                   err_msg=f"grad mismatch: d{n}")


def test_flash_extreme_logits(rng):
    # large-magnitude activations (post-L2Norm scale-20 features must
    # not overflow the unscaled-logit softmax)
    q, k, v = _rand(rng, 1, 256, 256, 64, 32, scale=8.0)
    want = np.asarray(_plain(q, k, v), np.float32)
    got = np.asarray(flash_attention(q, k, v), np.float32)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want,
                               atol=0.01 * np.abs(want).max())
