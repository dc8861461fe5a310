"""Golden tests for anchor generation.

An independent brute-force generator (straight from the SSD paper
formulas, written loop-wise here) cross-checks the vectorized
implementation, plus hand-computed spot values and the published prior
counts (8732 for the active 'v2' config)."""

import math
from itertools import product

import numpy as np
import pytest

from gssd_tpu.config import ANCHOR_CONFIGS
from gssd_tpu.ops.anchors import make_anchors


def brute_force_anchors(cfg):
    out = []
    square_only = cfg.name.startswith("v2_custom")
    for k, f in enumerate(cfg.feature_maps):
        f_k = cfg.min_dim / cfg.steps[k]
        for i, j in product(range(f), repeat=2):
            cx, cy = (j + 0.5) / f_k, (i + 0.5) / f_k
            s = cfg.min_sizes[k] / cfg.min_dim
            out.append([cx, cy, s, s])
            sp = math.sqrt(s * cfg.max_sizes[k] / cfg.min_dim)
            out.append([cx, cy, sp, sp])
            for ar in cfg.aspect_ratios[k]:
                r = math.sqrt(ar)
                if square_only:
                    out.append([cx, cy, s * r, s * r])
                    out.append([cx, cy, s / r, s / r])
                else:
                    out.append([cx, cy, s * r, s / r])
                    out.append([cx, cy, s / r, s * r])
    arr = np.asarray(out, dtype=np.float64)
    if cfg.clip:
        arr = np.clip(arr, 0, 1)
    return arr.astype(np.float32)


@pytest.mark.parametrize(
    "name", sorted(n for n in ANCHOR_CONFIGS if n != "v1")
)  # v1 follows the legacy formula, covered by test_v1_legacy_counts
def test_matches_brute_force(name):
    cfg = ANCHOR_CONFIGS[name]
    got = make_anchors(name)
    want = brute_force_anchors(cfg)
    assert got.shape == want.shape == (cfg.num_priors, 4)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_v2_published_count():
    # the canonical SSD300 prior count used by the reference models
    assert make_anchors("v2").shape == (8732, 4)
    # mbox [4, 6, 6, 6, 4, 4] (ssd_multiphase_custom_group.py:534-538)
    assert ANCHOR_CONFIGS["v2"].num_priors_per_cell == (4, 6, 6, 6, 4, 4)


def test_v2_spot_values():
    a = make_anchors("v2")
    # first cell of conv4_3: center (0.5/37.5), min_size square 30/300
    np.testing.assert_allclose(a[0], [0.5 / 37.5, 0.5 / 37.5, 0.1, 0.1], atol=1e-7)
    sp = math.sqrt(0.1 * 60 / 300)
    np.testing.assert_allclose(a[1], [0.5 / 37.5, 0.5 / 37.5, sp, sp], atol=1e-7)
    # ar=2 rectangles
    np.testing.assert_allclose(a[2, 2:], [0.1 * math.sqrt(2), 0.1 / math.sqrt(2)], atol=1e-7)
    np.testing.assert_allclose(a[3, 2:], [0.1 / math.sqrt(2), 0.1 * math.sqrt(2)], atol=1e-7)
    # second cell advances cx by 1/37.5 (row-major over (i, j))
    np.testing.assert_allclose(a[4, 0] - a[0, 0], 1 / 37.5, atol=1e-7)
    assert a[4, 1] == a[0, 1]
    # clipped & positive
    assert a.min() >= 0 and a.max() <= 1


def test_square_only_variants_are_square():
    a = make_anchors("v2_custom")
    np.testing.assert_allclose(a[:, 2], a[:, 3], atol=1e-7)


def test_v1_legacy_counts():
    from gssd_tpu.config import V1

    a = make_anchors("v1")
    # per-cell: k=0 has no max box -> 1 + 2 rect; others 2 + 4 rect
    assert V1.num_priors_per_cell == (3, 6, 6, 6, 6, 6)
    assert a.shape == (V1.num_priors, 4)
    # first cell: center (0.5/38), min square 30/300
    np.testing.assert_allclose(a[0], [0.5 / 38, 0.5 / 38, 0.1, 0.1],
                               atol=1e-7)
    assert (a >= 0).all() and (a <= 1).all()
