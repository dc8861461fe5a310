import jax
import jax.numpy as jnp
import numpy as np

from gssd_tpu.ops.deform_conv import DCN, deform_conv2d


def numpy_deform_conv(x, dy, dx, mask, weight, bias, stride=1, padding=1,
                      dilation=1):
    """Independent loop implementation of modulated deformable conv
    (DCNv2 semantics: bilinear sampling at grid+offset, per-group
    offsets, modulation mask, zero outside borders)."""
    B, H, W, C = x.shape
    K, _, Cout = weight.shape
    kh = kw = int(round(K ** 0.5))
    G = mask.shape[3]
    Cg = C // G
    Ho, Wo = mask.shape[1], mask.shape[2]
    out = np.zeros((B, Ho, Wo, Cout), np.float64)
    for b in range(B):
        for i in range(Ho):
            for j in range(Wo):
                patch = np.zeros((K, C), np.float64)
                for k in range(K):
                    u, v = divmod(k, kw)
                    for g in range(G):
                        py = i * stride - padding + u * dilation + dy[b, i, j, g, k]
                        px = j * stride - padding + v * dilation + dx[b, i, j, g, k]
                        y0, x0 = int(np.floor(py)), int(np.floor(px))
                        val = np.zeros(Cg)
                        for (yy, xx, wgt) in [
                            (y0, x0, (1 - (py - y0)) * (1 - (px - x0))),
                            (y0, x0 + 1, (1 - (py - y0)) * (px - x0)),
                            (y0 + 1, x0, (py - y0) * (1 - (px - x0))),
                            (y0 + 1, x0 + 1, (py - y0) * (px - x0)),
                        ]:
                            if 0 <= yy < H and 0 <= xx < W:
                                val += wgt * x[b, yy, xx, g * Cg:(g + 1) * Cg]
                        patch[k, g * Cg:(g + 1) * Cg] = val * mask[b, i, j, g, k]
                out[b, i, j] = np.einsum("kc,kco->o", patch, weight) + bias
    return out


def _rand_inputs(rng, B=1, H=5, W=5, C=4, Cout=6, G=2, K=9):
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    dy = rng.normal(size=(B, H, W, G, K)).astype(np.float32) * 1.5
    dx = rng.normal(size=(B, H, W, G, K)).astype(np.float32) * 1.5
    mask = rng.uniform(0, 1, (B, H, W, G, K)).astype(np.float32)
    weight = rng.normal(size=(K, C, Cout)).astype(np.float32) * 0.2
    bias = rng.normal(size=(Cout,)).astype(np.float32)
    return x, dy, dx, mask, weight, bias


def test_matches_numpy_reference(rng):
    args = _rand_inputs(rng)
    got = np.asarray(deform_conv2d(*(jnp.asarray(a) for a in args)))
    want = numpy_deform_conv(*args)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_zero_offset_equals_plain_conv(rng):
    x, _, _, _, weight, bias = _rand_inputs(rng, H=7, W=7)
    B, H, W, C = x.shape
    G, K = 2, 9
    zero = jnp.zeros((B, H, W, G, K))
    ones = jnp.ones((B, H, W, G, K))
    got = np.asarray(
        deform_conv2d(jnp.asarray(x), zero, zero, ones, jnp.asarray(weight),
                      jnp.asarray(bias))
    )
    # plain 3x3 conv, SAME padding: weight taps [K, C, Cout] -> HWIO
    w_hwio = weight.reshape(3, 3, C, -1)
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w_hwio), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-4)


def test_integer_offset_shifts_sampling(rng):
    # dx = +1 everywhere equals plain conv on x shifted left by 1
    x, _, _, _, weight, bias = _rand_inputs(rng, H=6, W=6)
    B, H, W, C = x.shape
    G, K = 2, 9
    zero = jnp.zeros((B, H, W, G, K))
    ones_m = jnp.ones((B, H, W, G, K))
    got = np.asarray(deform_conv2d(
        jnp.asarray(x), zero, zero + 1.0, ones_m, jnp.asarray(weight),
        jnp.asarray(bias)))
    x_shift = np.concatenate([x[:, :, 1:], np.zeros_like(x[:, :, :1])], axis=2)
    want = np.asarray(deform_conv2d(
        jnp.asarray(x_shift), zero, zero, ones_m, jnp.asarray(weight),
        jnp.asarray(bias)))
    # skip column 0: there the +1-offset version samples real pixels
    # where the shifted input sees conv zero-padding
    np.testing.assert_allclose(got[:, :, 1:], want[:, :, 1:], rtol=1e-4,
                               atol=1e-4)


def test_gradients_finite(rng):
    args = tuple(jnp.asarray(a) for a in _rand_inputs(rng, H=4, W=4))

    def loss(x, dy, dx, m, w, b):
        return jnp.sum(deform_conv2d(x, dy, dx, m, w, b) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(*args)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


def test_dcn_module_zero_init_is_plain_conv(rng):
    """conv_offset_mask is zero-init (dcn_v2_custom.py:66-77) so at init
    DCN == plain conv with mask 0.5."""
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8)).astype(np.float32))
    mod = DCN(features=8, deformable_groups=4, dtype=jnp.float32)
    vs = mod.init(jax.random.PRNGKey(3), x)
    out, offsets = mod.apply(vs, x)
    assert out.shape == (2, 8, 8, 8)
    np.testing.assert_allclose(np.asarray(offsets), 0.0)
    w = np.asarray(vs["params"]["weight"]).reshape(3, 3, 8, 8)
    want = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) * 0.5 + np.asarray(vs["params"]["bias"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-4,
                               atol=1e-5)


def test_patch_variant_matches_reference(rng):
    from gssd_tpu.ops.deform_conv import deform_conv2d_patch

    args = _rand_inputs(rng)
    got = np.asarray(deform_conv2d_patch(*(jnp.asarray(a) for a in args)))
    want = numpy_deform_conv(*args)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_patch_variant_gradients(rng):
    from gssd_tpu.ops.deform_conv import deform_conv2d, deform_conv2d_patch

    args = tuple(jnp.asarray(a) for a in _rand_inputs(rng, H=4, W=4))

    def loss(impl):
        return lambda *a: jnp.sum(impl(*a) ** 2)

    g1 = jax.grad(loss(deform_conv2d), argnums=(0, 1, 2, 3, 4))(*args)
    g2 = jax.grad(loss(deform_conv2d_patch), argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-4)
