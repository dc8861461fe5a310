"""Parity tests: Pallas MXU deformable sampler vs the XLA gather
implementation (which is itself tested against a loop-based numpy
reference in test_deform_conv.py). Runs in pallas interpreter mode on
the CPU test backend; the same kernels compile natively on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gssd_tpu.ops.deform_conv import deform_conv2d
from gssd_tpu.ops.pallas.deform_sample import (
    abx_sample,
    deform_conv2d_pallas,
    hat_weights,
)


def _rand_inputs(rng, B=2, H=6, W=6, C=8, Cout=4, G=2, K=9, scale=1.5):
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    dy = (rng.normal(size=(B, H, W, G, K)) * scale).astype(np.float32)
    dx = (rng.normal(size=(B, H, W, G, K)) * scale).astype(np.float32)
    mask = rng.uniform(0, 1, (B, H, W, G, K)).astype(np.float32)
    weight = (rng.normal(size=(K, C, Cout)) * 0.2).astype(np.float32)
    bias = rng.normal(size=(Cout,)).astype(np.float32)
    return x, dy, dx, mask, weight, bias


def test_hat_weights_are_bilinear():
    w = np.asarray(hat_weights(jnp.asarray([1.25]), 4))[0]
    np.testing.assert_allclose(w, [0, 0.75, 0.25, 0], atol=1e-6)
    # out of range -> all zeros
    w = np.asarray(hat_weights(jnp.asarray([-1.5, 4.2]), 4))
    np.testing.assert_allclose(w, 0.0)
    # half-in border pixel keeps partial weight (zero-padding semantics)
    w = np.asarray(hat_weights(jnp.asarray([-0.5]), 4))[0]
    np.testing.assert_allclose(w, [0.5, 0, 0, 0], atol=1e-6)


def test_abx_matches_dense_einsum(rng):
    N, G, P, H, W, Cg = 2, 2, 10, 5, 5, 8
    A = rng.uniform(0, 1, (N, G, P, H)).astype(np.float32)
    B = rng.uniform(0, 1, (N, G, P, W)).astype(np.float32)
    xg = rng.normal(size=(N, G, H, W, Cg)).astype(np.float32)
    got = np.asarray(abx_sample(jnp.asarray(A), jnp.asarray(B),
                                jnp.asarray(xg)))
    want = np.einsum("ngph,ngpw,nghwc->ngpc", A, B, xg)
    np.testing.assert_allclose(got, want, rtol=0.03, atol=0.03)


def test_pallas_forward_matches_xla(rng):
    args = _rand_inputs(rng)
    want = np.asarray(deform_conv2d(*(jnp.asarray(a) for a in args)))
    got = np.asarray(deform_conv2d_pallas(*(jnp.asarray(a) for a in args)))
    # bf16 sampling: tolerate ~1% relative error
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_pallas_zero_offsets_exact_grid(rng):
    # integer grid positions hit exact hat weights (1.0), so bf16
    # rounding is the only error source
    x, _, _, _, weight, bias = _rand_inputs(rng)
    B, H, W, C = x.shape
    G, K = 2, 9
    zero = jnp.zeros((B, H, W, G, K))
    ones = jnp.ones((B, H, W, G, K))
    want = np.asarray(deform_conv2d(
        jnp.asarray(x), zero, zero, ones, jnp.asarray(weight),
        jnp.asarray(bias)))
    got = np.asarray(deform_conv2d_pallas(
        jnp.asarray(x), zero, zero, ones, jnp.asarray(weight),
        jnp.asarray(bias)))
    np.testing.assert_allclose(got, want, rtol=0.02, atol=0.02)


def test_pallas_gradients_match_xla(rng):
    args = tuple(jnp.asarray(a) for a in _rand_inputs(rng, B=1, H=5, W=5,
                                                      C=8, Cout=4))

    def loss_xla(*a):
        return jnp.sum(deform_conv2d(*a) ** 2)

    def loss_pl(*a):
        return jnp.sum(deform_conv2d_pallas(*a) ** 2)

    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2, 3, 4, 5))(*args)
    names = ["x", "dy", "dx", "mask", "weight", "bias"]
    for n, a, b in zip(names, g_xla, g_pl):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(
            b / denom, a / denom, atol=0.08,
            err_msg=f"grad mismatch for {n}",
        )


def test_pallas_nondivisible_tile(rng):
    # P = 49 not divisible by the 128 tile -> padding path
    args = _rand_inputs(rng, B=1, H=7, W=7, C=8)
    want = np.asarray(deform_conv2d(*(jnp.asarray(a) for a in args)))
    got = np.asarray(deform_conv2d_pallas(*(jnp.asarray(a) for a in args)))
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)
