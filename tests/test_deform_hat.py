"""Parity of the single-dispatch hat-matrix DCN kernel
(ops/pallas/deform_hat.py) against the f32 XLA reference
implementation (ops/deform_conv.deform_conv2d)."""

import jax
import jax.numpy as jnp
import numpy as np

from gssd_tpu.ops.deform_conv import deform_conv2d
from gssd_tpu.ops.pallas.deform_hat import deform_conv2d_hat


def _rand_inputs(rng, B=2, H=6, W=6, C=8, Cout=4, G=2, K=9):
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    dy = (rng.normal(size=(B, H, W, G, K)) * 1.5).astype(np.float32)
    dx = (rng.normal(size=(B, H, W, G, K)) * 1.5).astype(np.float32)
    mask = rng.uniform(0, 1, (B, H, W, G, K)).astype(np.float32)
    weight = (rng.normal(size=(K, C, Cout)) * 0.2).astype(np.float32)
    bias = rng.normal(size=(Cout,)).astype(np.float32)
    return x, dy, dx, mask, weight, bias


def test_hat_forward_matches(rng):
    args = tuple(jnp.asarray(a) for a in _rand_inputs(rng))
    want = np.asarray(deform_conv2d(*args))
    got = np.asarray(deform_conv2d_hat(*args))
    # hat weights run through bf16 inside the kernel
    np.testing.assert_allclose(got, want, rtol=0.02, atol=0.02)


def test_hat_forward_multitile(rng):
    # P > TP so the kernel actually tiles + pads (P = 144, TP = 128)
    args = tuple(jnp.asarray(a) for a in _rand_inputs(rng, B=1, H=12, W=12))
    want = np.asarray(deform_conv2d(*args))
    got = np.asarray(deform_conv2d_hat(*args))
    np.testing.assert_allclose(got, want, rtol=0.02, atol=0.02)


def test_hat_gradients_match(rng):
    args = tuple(jnp.asarray(a) for a in _rand_inputs(rng, B=1, H=5, W=5))

    def loss(impl):
        return lambda *a: jnp.sum(impl(*a) ** 2)

    g_ref = jax.grad(loss(deform_conv2d), argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_hat = jax.grad(loss(deform_conv2d_hat),
                     argnums=(0, 1, 2, 3, 4, 5))(*args)
    names = ["x", "dy", "dx", "mask", "weight", "bias"]
    for n, a, b in zip(names, g_ref, g_hat):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b / denom, a / denom, atol=0.02,
                                   err_msg=f"grad mismatch: {n}")


def test_hat_zero_offsets(rng):
    """Zero offsets + unit mask = plain conv (the zero-init starting
    point of the DCN block, dcn_v2_custom.py:66-77)."""
    x, _, _, _, weight, bias = _rand_inputs(rng, H=7, W=7)
    B, H, W, C = x.shape
    G, K = 2, 9
    zero = jnp.zeros((B, H, W, G, K))
    ones = jnp.ones((B, H, W, G, K))
    got = np.asarray(deform_conv2d_hat(
        jnp.asarray(x), zero, zero, ones, jnp.asarray(weight),
        jnp.asarray(bias)))
    want = np.asarray(deform_conv2d(
        jnp.asarray(x), zero, zero, ones, jnp.asarray(weight),
        jnp.asarray(bias)))
    np.testing.assert_allclose(got, want, rtol=0.02, atol=0.02)


def test_hat_gradients_at_integer_offsets(rng):
    """At exactly-integer sample coords (the zero-init state) the offset
    gradient must use the same right-difference subgradient as the
    4-corner reference — this is where training starts."""
    x, _, _, _, weight, bias = _rand_inputs(rng, B=1, H=5, W=5)
    B, H, W, C = x.shape
    G, K = 2, 9
    zero = jnp.zeros((B, H, W, G, K))
    mask = jnp.full((B, H, W, G, K), 0.5)
    args = (jnp.asarray(x), zero, zero, mask, jnp.asarray(weight),
            jnp.asarray(bias))

    def loss(impl):
        return lambda *a: jnp.sum(impl(*a) ** 2)

    g_ref = jax.grad(loss(deform_conv2d), argnums=(1, 2, 3))(*args)
    g_hat = jax.grad(loss(deform_conv2d_hat), argnums=(1, 2, 3))(*args)
    for n, a, b in zip(["dy", "dx", "mask"], g_ref, g_hat):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b / denom, a / denom, atol=0.02,
                                   err_msg=f"grad mismatch: {n}")


def _allwin_args(rng, osig=0.2, outlier=False, H=24):
    """A map large enough that the all-window geometry is real
    (H=24: WL=248 < HW=576) with small offsets so _fits_all holds;
    `outlier` plants one huge offset to force the runtime fallback."""
    x, dy, dx, mask, weight, bias = _rand_inputs(rng, B=1, H=H, W=H)
    dy = dy * (osig / 1.5)
    dx = dx * (osig / 1.5)
    if outlier:
        dy = dy.copy()
        dy[0, H // 2, H // 2, 0, 4] = float(H) * 0.8
    return (x, dy, dx, mask, weight, bias)


def test_hat_allwin_matches(rng, monkeypatch):
    """The cond-free all-window dispatch (fits=True at small offsets)
    must match the XLA reference exactly like the fallback does."""
    import gssd_tpu.ops.pallas.deform_hat as hat

    args = tuple(jnp.asarray(a) for a in _allwin_args(rng))
    want = np.asarray(deform_conv2d(*args))
    monkeypatch.setattr(hat, "HAT_ALLWIN", True)
    got = np.asarray(deform_conv2d_hat(*args))
    np.testing.assert_allclose(got, want, rtol=0.02, atol=0.02)


def test_hat_allwin_gradients_match(rng, monkeypatch):
    import gssd_tpu.ops.pallas.deform_hat as hat

    args = tuple(jnp.asarray(a) for a in _allwin_args(rng))

    def loss(impl):
        return lambda *a: jnp.sum(impl(*a) ** 2)

    g_ref = jax.grad(loss(deform_conv2d), argnums=(0, 1, 2, 3, 4))(*args)
    monkeypatch.setattr(hat, "HAT_ALLWIN", True)
    g_hat = jax.grad(loss(deform_conv2d_hat), argnums=(0, 1, 2, 3, 4))(*args)
    for n, a, b in zip(["x", "dy", "dx", "mask", "weight"], g_ref, g_hat):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b / denom, a / denom, atol=0.02,
                                   err_msg=f"grad mismatch: {n}")


def test_hat_allwin_outlier_falls_back(rng, monkeypatch):
    """One out-of-window offset must flip the runtime cond to the exact
    fallback kernels — results stay correct, never clipped."""
    import gssd_tpu.ops.pallas.deform_hat as hat

    args = tuple(jnp.asarray(a) for a in _allwin_args(rng, outlier=True))
    want = np.asarray(deform_conv2d(*args))
    monkeypatch.setattr(hat, "HAT_ALLWIN", True)
    got = np.asarray(deform_conv2d_hat(*args))
    np.testing.assert_allclose(got, want, rtol=0.02, atol=0.02)

    g_ref = jax.grad(lambda *a: jnp.sum(deform_conv2d(*a) ** 2),
                     argnums=(1, 3))(*args)
    g_hat = jax.grad(lambda *a: jnp.sum(deform_conv2d_hat(*a) ** 2),
                     argnums=(1, 3))(*args)
    for n, a, b in zip(["dy", "mask"], g_ref, g_hat):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b / denom, a / denom, atol=0.02,
                                   err_msg=f"grad mismatch: {n}")


def test_hat_impl_falls_back_on_large_maps(monkeypatch):
    """'hat' must never be selected for maps whose bwd kernel spills
    VMEM on TPU (measured limit between 75x75=5625 ok and
    150x150=22500 OOM); beyond GSSD_HAT_MAX_HW the module dispatches
    the gather-based op instead (PixelLink 2s conv2_2 site)."""
    from gssd_tpu.ops.deform_conv import resolve_deform_impl

    assert resolve_deform_impl("hat", 38 * 38) is deform_conv2d_hat
    assert resolve_deform_impl("hat", 75 * 75) is deform_conv2d_hat
    assert resolve_deform_impl("hat", 150 * 150) is deform_conv2d
    monkeypatch.setenv("GSSD_HAT_MAX_HW", "1000")
    assert resolve_deform_impl("hat", 38 * 38) is deform_conv2d
