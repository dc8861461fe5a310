import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gssd_tpu.config import ModelConfig
from gssd_tpu.models import build_model


def _forward(cfg, batch=1, train=False):
    model, priors = build_model(cfg)
    x = jnp.zeros((batch, cfg.size, cfg.size, cfg.in_channels), jnp.float32)
    x = x.at[:, 100:120, 80:140, :].set(1.0)
    vs = model.init(jax.random.PRNGKey(0), x, train=False)
    mutable = ["batch_stats", "spectral"] if train else False
    out = model.apply(vs, x, train=train, mutable=mutable)
    if train:
        out = out[0]
    return out, priors, vs


BASE = ModelConfig(compute_dtype="float32")


def test_gssd_shapes():
    out, priors, _ = _forward(BASE)
    assert priors.shape == (8732, 4)
    assert out["loc"].shape == (1, 8732, 4)
    assert out["conf"].shape == (1, 8732, 2)
    assert np.isfinite(np.asarray(out["loc"])).all()
    assert np.isfinite(np.asarray(out["conf"])).all()


def test_ssd_ungrouped_shapes():
    cfg = dataclasses.replace(BASE, ssd_type="ssd", batch_norm=False)
    out, priors, vs = _forward(cfg)
    assert out["loc"].shape == (1, 8732, 4)
    # no fuse conv params present
    names = " ".join(vs["params"].keys())
    assert "fuse" not in names


def test_gsspp_full_flags():
    cfg = dataclasses.replace(
        BASE,
        use_self_attention=True,
        use_self_attention_base=True,
        num_dcn_layers=1,
        groups_dcn=4,
        dcn_cat_sab=True,
    )
    out, priors, vs = _forward(cfg, train=True)
    assert out["loc"].shape == (1, 8732, 4)
    assert len(out["offsets"]) == 1
    # offsets: [B, 38, 38, G=4, K=9, 2], zero at init
    assert out["offsets"][0].shape == (1, 38, 38, 4, 9, 2)
    np.testing.assert_allclose(np.asarray(out["offsets"][0]), 0.0)
    assert len(out["attn"]) == 6 and len(out["attn_base"]) == 6
    # DCN input is 1024ch (slice_and_cat of x and attn_g)
    w = vs["params"]["dcn_0"]["weight"]
    assert w.shape == (9, 1024, 512)
    # spectral-norm state exists for 12 attention blocks x 4 convs
    assert len(jax.tree_util.tree_leaves(vs["spectral"])) == 12 * 4 * 2


def test_detach_sab_requires_cat():
    with pytest.raises(ValueError):
        dataclasses.replace(BASE, detach_sab=True)


def test_train_forward_updates_batch_stats():
    cfg = BASE
    model, _ = build_model(cfg)
    x = jnp.ones((2, 300, 300, 12), jnp.float32)
    vs = model.init(jax.random.PRNGKey(0), x, train=False)
    _, mut = model.apply(vs, x, train=True, mutable=["batch_stats"])
    before = np.asarray(vs["batch_stats"]["vgg_1"]["BatchNorm_0"]["mean"])
    after = np.asarray(mut["batch_stats"]["vgg_1"]["BatchNorm_0"]["mean"])
    assert not np.allclose(before, after)


def test_feature_scale_halves_params():
    small = dataclasses.replace(BASE, feature_scale=1)
    model, _ = build_model(small)
    x = jnp.zeros((1, 300, 300, 12), jnp.float32)
    vs = model.init(jax.random.PRNGKey(0), x, train=False)
    n_params = sum(t.size for t in jax.tree_util.tree_leaves(vs["params"]))
    # grouped VGG-SSD should be well under the ungrouped ~26M
    assert 4e6 < n_params < 4e7
