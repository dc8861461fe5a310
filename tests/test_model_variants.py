import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gssd_tpu.config import ANCHOR_CONFIGS, ModelConfig
from gssd_tpu.models import build_model

BASE = ModelConfig(compute_dtype="float32")


def _forward(cfg, size=None):
    model, priors = build_model(cfg)
    size = size or cfg.size
    x = jnp.zeros((1, size, size, 12), jnp.float32)
    vs = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(vs, x, train=False)
    return out, priors, vs


def test_gssd_512():
    cfg = dataclasses.replace(BASE, size=512)
    out, priors, _ = _forward(cfg)
    n = ANCHOR_CONFIGS["v2_512"].num_priors
    assert priors.shape == (n, 4)
    assert out["loc"].shape == (1, n, 4)
    assert out["conf"].shape == (1, n, 2)


def test_fssd():
    cfg = dataclasses.replace(BASE, ssd_type="groupfssd")
    out, priors, vs = _forward(cfg)
    assert out["loc"].shape == (1, 8732, 4)
    assert "bn_fused" in vs["params"]
    assert np.isfinite(np.asarray(out["loc"])).all()


def test_fssd_ungrouped_differs_from_group():
    cfg = dataclasses.replace(BASE, ssd_type="fssd")
    out, _, vs = _forward(cfg)
    assert out["conf"].shape == (1, 8732, 2)
    # ungrouped: conv9_1 kernel has full input depth 768
    k = vs["params"]["conv9_1"]["Conv_0"]["kernel"]
    assert k.shape[2] == 768


def test_fusedssd():
    cfg = dataclasses.replace(BASE, ssd_type="fusedssd")
    out, _, vs = _forward(cfg)
    assert out["loc"].shape == (1, 8732, 4)
    assert "fuse_deconv_53" in vs["params"]
    assert np.isfinite(np.asarray(out["conf"])).all()
