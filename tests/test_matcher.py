import jax.numpy as jnp
import numpy as np

from gssd_tpu.ops import boxes as B
from gssd_tpu.ops.matcher import match, match_batch


def mk(*rows):
    return jnp.asarray(np.array(rows, dtype=np.float32))


PRIORS = mk([0.25, 0.25, 0.2, 0.2], [0.75, 0.25, 0.2, 0.2],
            [0.25, 0.75, 0.2, 0.2], [0.75, 0.75, 0.2, 0.2])


def run(truths, labels, valid, threshold=0.5):
    return match(
        mk(*truths), jnp.asarray(labels), jnp.asarray(valid), PRIORS,
        threshold, (0.1, 0.2),
    )


def test_simple_match():
    # gt sits exactly on prior 0 -> prior 0 positive, others background
    loc_t, conf_t = run([[0.15, 0.15, 0.35, 0.35]], [0], [True])
    assert conf_t.tolist() == [1, 0, 0, 0]
    np.testing.assert_allclose(np.asarray(loc_t[0]), 0.0, atol=1e-6)


def test_forced_match_below_threshold():
    # tiny gt overlapping prior 3 only a little: still forced positive
    loc_t, conf_t = run([[0.72, 0.72, 0.78, 0.78]], [0], [True])
    assert conf_t.tolist() == [0, 0, 0, 1]


def test_padding_ignored():
    truths = [[0.15, 0.15, 0.35, 0.35], [0.0, 0.0, 0.0, 0.0]]
    loc_t, conf_t = run(truths, [0, 0], [True, False])
    assert conf_t.tolist() == [1, 0, 0, 0]
    assert np.isfinite(np.asarray(loc_t)).all()


def test_all_padding():
    loc_t, conf_t = run([[0, 0, 0, 0]], [0], [False])
    assert conf_t.tolist() == [0, 0, 0, 0]
    assert np.isfinite(np.asarray(loc_t)).all()


def test_conflict_last_gt_wins():
    # two gts whose best prior is the same prior 0; reference overwrite
    # loop makes the later gt win (box_utils.py:102-105)
    truths = [[0.15, 0.15, 0.35, 0.35], [0.16, 0.16, 0.36, 0.36]]
    loc_t, conf_t = run(truths, [0, 0], [True, True])
    assert int(conf_t[0]) == 1
    expected = B.encode(mk(truths[1]), PRIORS[0:1], (0.1, 0.2))
    np.testing.assert_allclose(np.asarray(loc_t[0]), np.asarray(expected)[0], atol=1e-6)


def test_threshold_background():
    # gt overlapping prior 0 with IoU ~ 0.38 (< 0.5): prior 0 is still
    # forced (it is the gt's best prior), but a second prior with small
    # overlap stays background
    truths = [[0.15, 0.15, 0.35, 0.55]]
    _, conf_t = run(truths, [0], [True])
    assert int(conf_t[0]) == 1
    assert int(conf_t[1]) == 0


def test_batched_matches_single(rng):
    G, P = 5, PRIORS.shape[0]
    boxes = rng.uniform(0.05, 0.5, (3, G, 4)).astype(np.float32)
    boxes = np.concatenate([boxes[..., :2], boxes[..., :2] + boxes[..., 2:] * 0.5], -1)
    labels = np.zeros((3, G), np.int32)
    valid = rng.uniform(size=(3, G)) > 0.4
    lb, cb = match_batch(
        jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid), PRIORS,
        0.5, (0.1, 0.2),
    )
    for i in range(3):
        l1, c1 = match(
            jnp.asarray(boxes[i]), jnp.asarray(labels[i]), jnp.asarray(valid[i]),
            PRIORS, 0.5, (0.1, 0.2),
        )
        np.testing.assert_allclose(np.asarray(lb[i]), np.asarray(l1), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(cb[i]), np.asarray(c1))
