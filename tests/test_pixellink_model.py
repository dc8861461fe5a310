import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gssd_tpu.config import OptimConfig, PixelLinkConfig
from gssd_tpu.data.pixellink_targets import make_pixel_link_targets
from gssd_tpu.models.pixellink import PixelLink, upsample_bilinear_ac
from gssd_tpu.train import create_train_state
from gssd_tpu.train.steps import make_pixellink_train_step

CFG = PixelLinkConfig(version="4s")


def test_upsample_matches_torch_align_corners(rng):
    import torch
    import torch.nn.functional as F

    x = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    got = np.asarray(upsample_bilinear_ac(jnp.asarray(x), 16, 16))
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(16, 16),
        mode="bilinear", align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def _forward(cfg, size=96, cascade=False, train=False):
    model = PixelLink(cfg, cascade_fuse=cascade, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, size, size, 12)),
        jnp.float32,
    )
    vs = model.init(jax.random.PRNGKey(0), x, train=False)
    mutable = ["batch_stats", "spectral"] if train else False
    out = model.apply(vs, x, train=train, mutable=mutable)
    if train:
        out = out[0]
    return out, vs


def test_4s_shapes():
    out, _ = _forward(CFG, size=96)
    assert out["pixel"].shape == (1, 24, 24, 2)
    assert out["link"].shape == (1, 24, 24, 16)
    assert np.isfinite(np.asarray(out["pixel"])).all()


def test_2s_shapes():
    out, _ = _forward(dataclasses.replace(CFG, version="2s"), size=96)
    assert out["pixel"].shape == (1, 48, 48, 2)
    assert out["link"].shape == (1, 48, 48, 16)


def test_cascade_fuse_shapes():
    out, vs = _forward(CFG, size=96, cascade=True)
    assert out["pixel"].shape == (1, 24, 24, 2)
    # cascade final convs consume 4 stacked partial sums for 4s
    assert vs["params"]["final_1"]["kernel"].shape == (1, 1, 8, 2)
    assert vs["params"]["final_2"]["kernel"].shape == (1, 1, 64, 16)


def test_plusplus_flags():
    cfg = dataclasses.replace(
        CFG,
        use_self_attention=True,
        use_self_attention_base=True,
        num_dcn_layers=1,
        groups_dcn=4,
        dcn_cat_sab=True,
    )
    out, vs = _forward(cfg, size=96, train=True)
    assert out["pixel"].shape == (1, 24, 24, 2)
    assert len(out["offsets"]) == 1
    # DCN at conv3_3 for 4s: in 512 (256 cat 256), out 256
    assert vs["params"]["dcn_0"]["weight"].shape == (9, 512, 256)
    # 4 source + 4 base attention blocks for 4s (conv3_3..fc7;
    # conv2_2 joins only in 2s, pixel_link/model.py:131-147)
    attn_names = [k for k in vs["params"] if k.startswith("attn_")]
    assert len([k for k in attn_names if k.startswith("attn_base")]) == 4
    assert len(attn_names) == 8


def test_pixellink_train_step_learns(rng):
    size = 96
    model = PixelLink(CFG, dtype=jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, size, size, 12)), OptimConfig(lr=1e-3, stepvalues=()),
    )
    step = jax.jit(make_pixellink_train_step(model, CFG, OptimConfig()))

    img = rng.uniform(0, 0.2, (2, size, size, 12)).astype(np.float32)
    img[:, 30:60, 20:50, :] += 0.8
    boxes = np.array([[20 / 96, 30 / 96, 50 / 96, 60 / 96]], np.float32)
    t = make_pixel_link_targets(boxes, size, "4s")
    batch = {
        "image": jnp.asarray(img),
        "pixel_mask": jnp.asarray(np.stack([t["pixel_mask"]] * 2)),
        "neg_pixel_mask": jnp.asarray(np.stack([t["neg_pixel_mask"]] * 2)),
        "pixel_pos_weight": jnp.asarray(
            np.stack([t["pixel_pos_weight"]] * 2)),
        "link_mask": jnp.asarray(np.stack([t["link_mask"]] * 2)),
    }
    losses = []
    for _ in range(10):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert min(losses[-3:]) < losses[0]
