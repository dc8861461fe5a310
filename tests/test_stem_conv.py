"""Pallas wide-spatial conv kernel (ops/pallas/stem_conv.py) vs the XLA
grouped-conv reference, interpret mode. Covers the stem-class sites the
ConvBNRelu TPU path lowers through it (conv1_1 12ch / conv1_2 64ch,
reference ssd_multiphase_custom_group.py:434-444)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gssd_tpu.ops.pallas.stem_conv import conv3x3_wide, pack_weights


def _ref(x, wg, bias, groups):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, wg.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, wg, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        feature_group_count=groups) + bias


CASES = [
    # (B, H, W, Cin, Cout, groups) — conv1_1-like, conv1_2-like, dense,
    # non-square, H with non-20 divisor
    (2, 20, 20, 12, 16, 4),
    (1, 30, 30, 16, 16, 4),
    (2, 24, 18, 8, 8, 1),
    (1, 19, 21, 8, 16, 2),
]


@pytest.mark.parametrize("B,H,W,C,Cout,G", CASES)
def test_forward_matches_grouped_conv(B, H, W, C, Cout, G):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, C)), jnp.float32)
    wg = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, C // G, Cout)),
                     jnp.float32)
    b = jnp.asarray(rng.uniform(-0.1, 0.1, (Cout,)), jnp.float32)
    ya = _ref(x, wg, b, G)
    yb = conv3x3_wide(x, pack_weights(wg, G), b)
    # kernel computes in bf16 (the model's compute dtype)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               atol=5e-2, rtol=2e-2)


@pytest.mark.parametrize("B,H,W,C,Cout,G", CASES[:2])
def test_gradients_match(B, H, W, C, Cout, G):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, C)), jnp.float32)
    wg = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, C // G, Cout)),
                     jnp.float32)
    b = jnp.asarray(rng.uniform(-0.1, 0.1, (Cout,)), jnp.float32)

    ga = jax.grad(lambda a: jnp.sum(jnp.sin(_ref(a[0], a[1], a[2], G))))(
        (x, wg, b))
    gb = jax.grad(lambda a: jnp.sum(jnp.sin(
        conv3x3_wide(a[0], pack_weights(a[1], G), a[2]))))((x, wg, b))
    for name, a_, b_ in zip(("dx", "dw", "db"), ga, gb):
        scale = max(float(jnp.abs(a_).max()), 1e-6)
        err = float(jnp.abs(a_ - b_).max()) / scale
        assert err < 1e-2, f"{name} rel err {err}"


def test_bf16_inputs():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 30, 30, 12)), jnp.bfloat16)
    wg = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, 3, 64)), jnp.bfloat16)
    b = jnp.zeros((64,), jnp.float32)
    y = conv3x3_wide(x, pack_weights(wg, 4), b)
    assert y.shape == (1, 30, 30, 64) and y.dtype == jnp.bfloat16
    ya = _ref(x.astype(jnp.float32),
              jnp.asarray(wg, jnp.float32).reshape(3, 3, 3, 64), b, 4)
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(ya),
                               atol=0.1, rtol=5e-2)
