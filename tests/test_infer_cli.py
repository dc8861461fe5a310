"""End-to-end test of the infer.py serving CLI.

Trains the mini model for a few iterations (checkpoint lands on the
final iteration), then drives infer.py's main() against the test split
and checks the detections JSON contract plus the per-image latency
report (the analog of reference test.py:57-60 im_detect timing).
"""

import json
import re

import pytest
from mini_model import build_mini

from gssd_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def mini_ml(tmp_path_factory):
    path = tmp_path_factory.mktemp("ml64_infer")
    make_synthetic_dataset(str(path), num_subjects=8, slices_per_subject=2,
                           image_size=64)
    return str(path)


def test_infer_cli_e2e(mini_ml, tmp_path, monkeypatch, capsys):
    import gssd_tpu.models as models_pkg

    monkeypatch.setattr(models_pkg, "build_model", lambda cfg: build_mini())
    monkeypatch.delenv("GSSD_DP_DEVICES", raising=False)
    import train

    out = str(tmp_path / "out")
    common = [
        "--datapath", mini_ml,
        "--output", out,
        "--num_test_subjects", "3",
        "--ssd_dim", "64",
        "--compute_dtype", "float32",
        "--load_data_to_ram", "True",
        "--eval_batch", "4",
    ]
    train.main([
        *common,
        "--batch_size", "8",
        "--max_iter", "11",
        "--val_every", "1000",  # only the final-iteration eval fires
        "--speedrun", "1",
    ])
    capsys.readouterr()

    import infer

    det_path = str(tmp_path / "dets.json")
    # the final checkpoint lands on the last iteration, max_iter - 1
    infer.main([*common, "--checkpoint", "10", "--det_output", det_path])
    text = capsys.readouterr().out

    with open(det_path) as f:
        dets = json.load(f)
    assert len(dets) == 6  # 3 test subjects x 2 slices
    for row in dets:
        assert set(row) == {"id", "scores", "boxes"}
        assert len(row["scores"]) == len(row["boxes"])
        for b in row["boxes"]:
            assert len(b) == 4

    # per-image latency report (reference test.py:57-60 analog)
    assert re.search(r"im_detect: 4/6 [\d.]+ ms/image", text), text
    assert re.search(r"im_detect: 6/6 [\d.]+ ms/image", text), text
    m = re.search(r"latency: mean ([\d.]+) ms/image, median [\d.]+", text)
    assert m and float(m.group(1)) > 0, text
