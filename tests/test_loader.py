"""MPBatchLoader: worker-count-independent deterministic batch stream
(reference analog: DataLoader(num_workers), train v2.py:538)."""

import numpy as np
import pytest

from gssd_tpu.data.dataset import BatchLoader, LesionDataset, MPBatchLoader


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ml")
    rng = np.random.default_rng(0)
    ids = []
    lines = []
    for s in range(6):
        for i in range(3):
            sid = f"subj{s}_{i}"
            np.save(root / f"{sid}_ct.npy",
                    rng.uniform(0, 1, (4, 3, 32, 32)).astype(np.float32))
            np.save(root / f"{sid}_bbox.npy",
                    np.asarray([[4, 4, 20, 20, 0]], np.float32))
            ids.append(sid)
            lines.append(f"{sid}|subj{s}")
    (root / "metadata.txt").write_text("\n".join(lines) + "\n")
    return str(root), ids


class _JitterTransform:
    """Stand-in augmentation with the rng attribute contract."""

    def __init__(self, seed=0):
        self.rng = np.random.default_rng(seed)

    def __call__(self, img, boxes, labels):
        return img + self.rng.uniform(0, 0.01), boxes, labels


def _stream(path, ids, num_workers, n=6):
    ds = LesionDataset(path, ids, transform=_JitterTransform())
    ld = MPBatchLoader(ds, batch_size=4, seed=11, num_workers=num_workers)
    it = iter(ld)
    out = [next(it) for _ in range(n)]
    ld.shutdown()
    return out

def test_mp_loader_deterministic_across_worker_counts(tiny_dataset):
    path, ids = tiny_dataset
    a = _stream(path, ids, 1)
    b = _stream(path, ids, 3)
    for i, (x, y) in enumerate(zip(a, b)):
        np.testing.assert_allclose(x["image"], y["image"],
                                   err_msg=f"batch {i}")
        np.testing.assert_array_equal(x["boxes"], y["boxes"])
        np.testing.assert_array_equal(x["valid"], y["valid"])


def test_mp_loader_epoch_coverage(tiny_dataset):
    """Batches walk shuffled epochs without repetition inside an epoch
    (same guarantee as the thread loader's permutation stream)."""
    path, ids = tiny_dataset
    ds = LesionDataset(path, ids)
    ld = MPBatchLoader(ds, batch_size=6, seed=3, num_workers=2)
    it = iter(ld)
    # 18 items / 6 per batch -> 3 batches per epoch
    seen = []
    for _ in range(3):
        b = next(it)
        seen.extend(b["image"].sum(axis=(1, 2, 3)).round(4).tolist())
    ld.shutdown()
    assert len(set(seen)) == len(ids), "epoch must cover every item once"


def test_mp_loader_exact_resume(tiny_dataset):
    """start_batch=j reproduces the continuous stream from batch j."""
    path, ids = tiny_dataset
    cont = _stream(path, ids, 1, n=6)
    ds = LesionDataset(path, ids, transform=_JitterTransform())
    ld = MPBatchLoader(ds, batch_size=4, seed=11, num_workers=2,
                       start_batch=3)
    it = iter(ld)
    resumed = [next(it) for _ in range(3)]
    ld.shutdown()
    for i, (x, y) in enumerate(zip(cont[3:], resumed)):
        np.testing.assert_allclose(x["image"], y["image"],
                                   err_msg=f"batch {3 + i}")


def test_mp_loader_exact_resume_pixellink(tiny_dataset):
    """The pixellink MP stream (augmentation-generated pixel/link target
    maps + collate_pixellink) also resumes exactly at start_batch — the
    path train_pixellink.py --resume --num_workers>1 takes."""
    from gssd_tpu.data.augment import SSDAugmentation
    from gssd_tpu.data.dataset import collate_pixellink

    path, ids = tiny_dataset

    def stream(start, n, workers):
        ds = LesionDataset(
            path, ids,
            transform=SSDAugmentation(
                pixeljitter=0.01, size=32, seed=7, use_normalize=True,
                pixel_link_size=32, pixel_link_version="4s"))
        ld = MPBatchLoader(ds, batch_size=4, seed=11, num_workers=workers,
                           collate_fn=collate_pixellink, start_batch=start)
        it = iter(ld)
        out = [next(it) for _ in range(n)]
        ld.shutdown()
        return out

    cont = stream(0, 5, 1)
    resumed = stream(2, 3, 2)
    for i, (x, y) in enumerate(zip(cont[2:], resumed)):
        for key in ("image", "pixel_mask", "link_mask", "pixel_pos_weight",
                    "boxes", "valid"):
            np.testing.assert_allclose(x[key], y[key],
                                       err_msg=f"batch {2 + i} key {key}")


def test_thread_loader_static_shapes(tiny_dataset):
    path, ids = tiny_dataset
    ds = LesionDataset(path, ids)
    it = iter(BatchLoader(ds, batch_size=5, max_gt=7, seed=1))
    b = next(it)
    assert b["image"].shape == (5, 32, 32, 12)
    assert b["boxes"].shape == (5, 7, 4)
    assert b["valid"].sum() == 5
