import jax.numpy as jnp
import numpy as np

from gssd_tpu.config import LossConfig
from gssd_tpu.ops import boxes as B
from gssd_tpu.ops.anchors import make_anchors
from gssd_tpu.ops.losses import multibox_loss, smooth_l1
from gssd_tpu.ops.matcher import match_batch


def test_smooth_l1_values():
    x = jnp.array([-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 3.0])
    got = np.asarray(smooth_l1(x))
    want = [1.5, 0.5, 0.125, 0.0, 0.125, 0.5, 2.5]
    np.testing.assert_allclose(got, want, atol=1e-6)


def _fixture(rng, B_=4, G=3, P=None):
    priors = make_anchors("v2")
    P = priors.shape[0]
    xy = rng.uniform(0.1, 0.6, (B_, G, 2))
    wh = rng.uniform(0.1, 0.3, (B_, G, 2))
    gt = np.concatenate([xy, np.clip(xy + wh, 0, 1)], -1).astype(np.float32)
    labels = np.zeros((B_, G), np.int32)
    valid = np.ones((B_, G), bool)
    valid[0, -1] = False
    return jnp.asarray(priors), jnp.asarray(gt), jnp.asarray(labels), jnp.asarray(valid)


def test_perfect_predictions_low_loc_loss(rng):
    priors, gt, labels, valid = _fixture(rng)
    B_, G = gt.shape[:2]
    P = priors.shape[0]
    loc_t, conf_t = match_batch(gt, labels, valid, priors, 0.5, (0.1, 0.2))
    # predict exactly the targets -> loc loss 0
    conf = np.full((B_, P, 2), 0.0, np.float32)
    conf[..., 0] = 10.0  # confident background everywhere
    conf = np.where(
        np.asarray(conf_t)[..., None] > 0,
        np.array([0.0, 10.0], np.float32),
        conf,
    )
    loss_l, loss_c, aux = multibox_loss(
        loc_t, jnp.asarray(conf), priors, gt, labels, valid
    )
    assert float(loss_l) < 1e-6
    assert float(loss_c) < 1e-3
    assert int(aux["num_pos"]) > 0


def test_ohnm_ratio(rng):
    priors, gt, labels, valid = _fixture(rng)
    B_ = gt.shape[0]
    P = priors.shape[0]
    loc = jnp.zeros((B_, P, 4))
    conf = jnp.asarray(rng.normal(0, 1, (B_, P, 2)).astype(np.float32))
    cfg = LossConfig()
    _, _, aux = multibox_loss(loc, conf, priors, gt, labels, valid, cfg)
    _, conf_t = match_batch(gt, labels, valid, priors, 0.5, (0.1, 0.2))
    num_pos = np.asarray(conf_t > 0).sum(1)
    want_neg = np.minimum(cfg.neg_pos_ratio * num_pos, P - 1).sum()
    assert int(aux["num_neg"]) == int(want_neg)


def test_loss_matches_numpy_reference(rng):
    """Cross-check the full OHNM loss against an independent numpy
    implementation of the published SSD loss."""
    priors, gt, labels, valid = _fixture(rng, B_=2)
    B_, G = gt.shape[:2]
    P = priors.shape[0]
    loc = rng.normal(0, 0.2, (B_, P, 4)).astype(np.float32)
    conf = rng.normal(0, 1, (B_, P, 2)).astype(np.float32)
    got_l, got_c, _ = multibox_loss(
        jnp.asarray(loc), jnp.asarray(conf), priors, gt, labels, valid
    )

    loc_t, conf_t = match_batch(gt, labels, valid, priors, 0.5, (0.1, 0.2))
    loc_t, conf_t = np.asarray(loc_t), np.asarray(conf_t)
    pos = conf_t > 0
    d = loc - loc_t
    ad = np.abs(d)
    sl1 = np.where(ad < 1, 0.5 * d * d, ad - 0.5).sum(-1)
    want_l = (sl1 * pos).sum()

    m = conf.max(-1, keepdims=True)
    lse = np.log(np.exp(conf - m).sum(-1)) + m[..., 0]
    ce = lse - np.take_along_axis(conf, conf_t[..., None], -1)[..., 0]
    mining = np.where(pos, 0, ce)
    neg = np.zeros_like(pos)
    for i in range(B_):
        k = min(3 * pos[i].sum(), P - 1)
        order = np.argsort(-mining[i], kind="stable")
        neg[i, order[:k]] = True
    want_c = (ce * (pos | neg)).sum()
    n = max(pos.sum(), 1)
    np.testing.assert_allclose(float(got_l), want_l / n, rtol=1e-4)
    np.testing.assert_allclose(float(got_c), want_c / n, rtol=1e-4)


def test_no_positives_is_finite():
    priors = jnp.asarray(make_anchors("v2"))
    B_, P = 2, priors.shape[0]
    gt = jnp.zeros((B_, 2, 4))
    labels = jnp.zeros((B_, 2), jnp.int32)
    valid = jnp.zeros((B_, 2), bool)
    loss_l, loss_c, _ = multibox_loss(
        jnp.zeros((B_, P, 4)), jnp.zeros((B_, P, 2)), priors, gt, labels, valid
    )
    assert np.isfinite(float(loss_l)) and np.isfinite(float(loss_c))
