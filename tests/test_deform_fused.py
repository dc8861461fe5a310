"""Parity of the fused-backward DCN (patch-gather fwd, analytic offset
grads, Pallas dx) against the f32 XLA reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from gssd_tpu.ops.deform_conv import deform_conv2d
from gssd_tpu.ops.deform_fused import deform_conv2d_fused


def _rand_inputs(rng, B=2, H=6, W=6, C=8, Cout=4, G=2, K=9):
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    dy = (rng.normal(size=(B, H, W, G, K)) * 1.5).astype(np.float32)
    dx = (rng.normal(size=(B, H, W, G, K)) * 1.5).astype(np.float32)
    mask = rng.uniform(0, 1, (B, H, W, G, K)).astype(np.float32)
    weight = (rng.normal(size=(K, C, Cout)) * 0.2).astype(np.float32)
    bias = rng.normal(size=(Cout,)).astype(np.float32)
    return x, dy, dx, mask, weight, bias


def test_fused_forward_matches(rng):
    args = tuple(jnp.asarray(a) for a in _rand_inputs(rng))
    want = np.asarray(deform_conv2d(*args))
    got = np.asarray(deform_conv2d_fused(*args))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fused_gradients_match(rng):
    args = tuple(jnp.asarray(a) for a in _rand_inputs(rng, B=1, H=5, W=5))

    def loss(impl):
        return lambda *a: jnp.sum(impl(*a) ** 2)

    g_ref = jax.grad(loss(deform_conv2d), argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_fus = jax.grad(loss(deform_conv2d_fused),
                     argnums=(0, 1, 2, 3, 4, 5))(*args)
    names = ["x", "dy", "dx", "mask", "weight", "bias"]
    for n, a, b in zip(names, g_ref, g_fus):
        a, b = np.asarray(a), np.asarray(b)
        # dx runs through the bf16 Pallas kernel: looser tolerance there
        tol = 0.02 if n == "x" else 1e-3
        denom = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b / denom, a / denom, atol=tol,
                                   err_msg=f"grad mismatch: {n}")


def test_fused_zero_offsets(rng):
    x, _, _, _, weight, bias = _rand_inputs(rng, H=7, W=7)
    B, H, W, C = x.shape
    G, K = 2, 9
    zero = jnp.zeros((B, H, W, G, K))
    ones = jnp.ones((B, H, W, G, K))
    got = np.asarray(deform_conv2d_fused(
        jnp.asarray(x), zero, zero, ones, jnp.asarray(weight),
        jnp.asarray(bias)))
    want = np.asarray(deform_conv2d(
        jnp.asarray(x), zero, zero, ones, jnp.asarray(weight),
        jnp.asarray(bias)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
