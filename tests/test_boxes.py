import jax.numpy as jnp
import numpy as np

from gssd_tpu.ops import boxes as B


def test_point_center_roundtrip(rng):
    pts = rng.uniform(0, 1, (50, 4)).astype(np.float32)
    pts = np.concatenate([np.minimum(pts[:, :2], pts[:, 2:]),
                          np.maximum(pts[:, :2], pts[:, 2:]) + 0.01], 1)
    back = B.point_form(B.center_size(jnp.asarray(pts)))
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-6)


def test_iou_known_values():
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.array([[0.5, 0.5, 1.5, 1.5], [0.0, 0.0, 1.0, 1.0],
                   [2.0, 2.0, 3.0, 3.0], [0.0, 0.0, 0.5, 1.0]])
    got = np.asarray(B.iou(a, b))[0]
    np.testing.assert_allclose(got, [0.25 / 1.75, 1.0, 0.0, 0.5], atol=1e-6)


def test_iobb_known_values():
    gt = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    pred = jnp.array([[0.5, 0.5, 1.5, 1.5], [0.25, 0.25, 0.75, 0.75]])
    got = np.asarray(B.iobb(gt, pred))[0]
    # intersection / predicted-box area (test_ap_iobb.py:273-278)
    np.testing.assert_allclose(got, [0.25 / 1.0, 1.0], atol=1e-6)


def test_encode_decode_roundtrip(rng):
    priors = rng.uniform(0.2, 0.8, (100, 4)).astype(np.float32)
    priors[:, 2:] = rng.uniform(0.05, 0.3, (100, 2))
    gt = np.concatenate(
        [priors[:, :2] - priors[:, 2:] / 3, priors[:, :2] + priors[:, 2:] / 3], 1
    ).astype(np.float32)
    enc = B.encode(jnp.asarray(gt), jnp.asarray(priors))
    dec = B.decode(enc, jnp.asarray(priors))
    np.testing.assert_allclose(np.asarray(dec), gt, atol=1e-5)


def test_encode_zero_for_identical():
    priors = jnp.array([[0.5, 0.5, 0.2, 0.2]])
    gt = B.point_form(priors)
    enc = np.asarray(B.encode(gt, priors))
    np.testing.assert_allclose(enc, 0.0, atol=1e-6)


def test_decode_batched(rng):
    loc = jnp.asarray(rng.normal(0, 0.1, (4, 10, 4)).astype(np.float32))
    priors = jnp.asarray(rng.uniform(0.3, 0.6, (10, 4)).astype(np.float32))
    out = B.decode(loc, priors)
    assert out.shape == (4, 10, 4)
    one = B.decode(loc[0], priors)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(one), atol=1e-6)
