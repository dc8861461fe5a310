"""Observability: TensorBoard scalars + tab-separated text logs.

Reference: tensorboardX SummaryWriter with loss/meta/eval scalar
families and input-image grids (train v2.py:286-298, 344-354), plus
train/valid/test/args tab-separated text logs (:485-510). Here one
MetricsLogger fronts both sinks; TensorBoard is optional (events via
torch.utils.tensorboard when importable, silently skipped otherwise so
headless TPU pods don't need it).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Mapping, Optional


class MetricsLogger:
    def __init__(self, log_dir: str, tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._files: Dict[str, object] = {}
        self.tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(os.path.join(log_dir, "tb"))
            except Exception:
                self.tb = None

    def _file(self, name: str):
        if name not in self._files:
            self._files[name] = open(
                os.path.join(self.log_dir, f"{name}_log.txt"), "a",
                buffering=1,
            )
        return self._files[name]

    def log_args(self, args: Mapping):
        f = self._file("args")
        for k, v in sorted(dict(args).items()):
            f.write(f"{k}\t{v}\n")
        f.write("\n")

    def log_scalars(self, group: str, step: int, scalars: Mapping[str, float],
                    file: Optional[str] = None):
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(f"{group}/{k}", float(v), step)
        f = self._file(file or "train")
        cols = "\t".join(f"{k}={float(v):.6g}" for k, v in scalars.items())
        f.write(f"{step}\t{group}\t{cols}\n")

    def log_histogram(self, tag: str, step: int, values):
        """Score histograms (reference test_ap_iobb.py:201-207 logs
        detection scores pre/post confidence filter)."""
        if self.tb is not None:
            import numpy as np

            values = np.asarray(values, np.float32).ravel()
            if values.size:
                self.tb.add_histogram(tag, values, step)

    def log_image(self, tag: str, step: int, image):
        """image: [H, W, C] float array in [0, 1]."""
        if self.tb is not None:
            import numpy as np

            self.tb.add_image(tag, np.transpose(image, (2, 0, 1)), step)

    def close(self):
        for f in self._files.values():
            f.close()
        if self.tb is not None:
            self.tb.close()
