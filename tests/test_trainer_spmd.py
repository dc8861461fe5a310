"""Trainer-level SPMD proof: `train.py` itself (not just the library
step helpers) must shard the batch over the device mesh and produce the
same loss trajectory as a single-device run — the end-user path of the
reference's one-line torch.nn.DataParallel (train v2.py:593).

Runs train.main() with the full-size GSSD swapped for the mini detector
(the trainer wiring — plan_parallelism, loaders, fold stacking, metrics
— is what's under test, not the model)."""

import re

import numpy as np
import pytest

from mini_model import build_mini

from gssd_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def mini_ml(tmp_path_factory):
    path = tmp_path_factory.mktemp("ml64")
    make_synthetic_dataset(str(path), num_subjects=8, slices_per_subject=2,
                           image_size=64)
    return str(path)


def _run_trainer(mini_ml, tmp_path, monkeypatch, capsys, tag,
                 extra=(), force_devices=None):
    import gssd_tpu.models as models_pkg

    monkeypatch.setattr(models_pkg, "build_model", lambda cfg: build_mini())
    if force_devices is not None:
        monkeypatch.setenv("GSSD_DP_DEVICES", str(force_devices))
    else:
        monkeypatch.delenv("GSSD_DP_DEVICES", raising=False)
    import train

    train.main([
        "--datapath", mini_ml,
        "--output", str(tmp_path / f"out_{tag}"),
        "--num_test_subjects", "3",
        "--batch_size", "8",
        "--max_iter", "21",
        "--val_every", "1000",
        "--speedrun", "1000",
        "--ssd_dim", "64",
        "--compute_dtype", "float32",
        "--load_data_to_ram", "True",
        *extra,
    ])
    out = capsys.readouterr().out
    losses = [float(m) for m in re.findall(r"iter \d+: loss=([\d.]+)", out)]
    assert len(losses) == 3  # iters 0, 10, 20
    return out, losses


def test_trainer_data_parallel_matches_single_device(
        mini_ml, tmp_path, monkeypatch, capsys):
    _, single = _run_trainer(mini_ml, tmp_path, monkeypatch, capsys,
                             "single", force_devices=1)
    out, multi = _run_trainer(mini_ml, tmp_path, monkeypatch, capsys,
                              "dp8")
    assert "parallelism: mesh(data=8) layout=data" in out
    np.testing.assert_allclose(multi, single, rtol=2e-4)


def test_trainer_device_cached_data_path(
        mini_ml, tmp_path, monkeypatch, capsys):
    """--aug_method device_cached: device-resident dataset, on-device
    augmentation, no per-step image H2D — trains to finite losses
    through the same trainer loop."""
    _, losses = _run_trainer(
        mini_ml, tmp_path, monkeypatch, capsys, "cached",
        extra=["--aug_method", "device_cached"])
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_trainer_fold_data_mesh_matches_single_device(
        mini_ml, tmp_path, monkeypatch, capsys):
    cv = ["--cross_validation", "2"]
    _, single = _run_trainer(mini_ml, tmp_path, monkeypatch, capsys,
                             "cv_single", extra=cv, force_devices=1)
    out, multi = _run_trainer(mini_ml, tmp_path, monkeypatch, capsys,
                              "cv_mesh", extra=cv)
    assert "parallelism: mesh(fold=2, data=4) layout=fold_data" in out
    np.testing.assert_allclose(multi, single, rtol=2e-4)
