"""Mini end-to-end of the UNet liver-seg trainer (train_unet.py) — the
reference's DEPRECATED side experiment (train_liverseg_unet.py) driven
through the CLI on a tiny synthetic ml_ready set."""

import numpy as np

from gssd_tpu.data.synthetic import make_synthetic_dataset


def test_unet_trainer_e2e(tmp_path, capsys):
    make_synthetic_dataset(str(tmp_path / "ml"), num_subjects=4,
                           slices_per_subject=2, image_size=64)
    import train_unet

    res = train_unet.main([
        "--datapath", str(tmp_path / "ml"),
        "--output", str(tmp_path / "out"),
        "--batch_size", "4", "--max_iter", "31", "--val_every", "15",
        "--feature_scale", "8", "--test_size", "0.25",
    ])
    assert np.isfinite(res["loss"])
    assert 0.0 <= res["pixel_acc"] <= 1.0
    assert 0.0 <= res["fg_iou"] <= 1.0
    out = capsys.readouterr().out
    assert "valid" in out
    # checkpoint written and resumable
    res2 = train_unet.main([
        "--datapath", str(tmp_path / "ml"),
        "--output", str(tmp_path / "out"),
        "--batch_size", "4", "--max_iter", "33", "--val_every", "15",
        "--feature_scale", "8", "--test_size", "0.25",
        "--resume", "30",
    ])
    assert np.isfinite(res2["loss"])


def test_weighted_nll_matches_torch_semantics(rng):
    """class_weight follows torch NLLLoss: weighted sum / summed target
    weights."""
    import jax.numpy as jnp

    from gssd_tpu.models.unet import segmentation_nll_loss

    logits = jnp.asarray(rng.normal(size=(2, 4, 4, 2)).astype(np.float32))
    labels = jnp.asarray((rng.uniform(size=(2, 4, 4)) > 0.5).astype(np.int32))
    cw = jnp.asarray([0.25, 0.75])
    got = float(segmentation_nll_loss(logits, labels, class_weight=cw))

    import torch
    import torch.nn.functional as F

    t_log = F.log_softmax(
        torch.tensor(np.asarray(logits)).permute(0, 3, 1, 2), dim=1)
    want = F.nll_loss(t_log, torch.tensor(np.asarray(labels)).long(),
                      weight=torch.tensor([0.25, 0.75]))
    np.testing.assert_allclose(got, float(want), rtol=1e-5)
