import os

import numpy as np

from gssd_tpu.utils.visualize import (
    draw_boxes,
    draw_offsets,
    dump_eval_visuals,
    input_grid_with_boxes,
    offsets_to_image_coords,
)


def test_draw_boxes(rng):
    img = rng.uniform(0, 1, (64, 64)).astype(np.float32)
    out = draw_boxes(img, np.array([[10, 10, 40, 40]]),
                     scores=np.array([0.9]))
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
    # a green border pixel exists
    assert (out[10, 10:40, 1] == 255).any()


def test_offsets_to_image_coords_zero_offset():
    Ho = 8
    offs = np.zeros((Ho, Ho, 2, 9, 2), np.float32)
    pos = offsets_to_image_coords(offs, image_size=64)
    # center tap (k=4: u=v=1) of cell (i,j) sits at the cell center
    stride = 64 / Ho
    np.testing.assert_allclose(pos[3, 5, 0, 4],
                               [3 * stride + stride / 2,
                                5 * stride + stride / 2])
    # k=0 tap is one stride up-left of the center tap
    np.testing.assert_allclose(pos[3, 5, 0, 4] - pos[3, 5, 0, 0],
                               [stride, stride])


def test_dump_eval_visuals(tmp_path, rng):
    img = rng.uniform(0, 1, (96, 96, 12)).astype(np.float32)
    gt = np.array([[10.0, 10, 40, 40]])
    det = np.zeros((2, 200, 5), np.float32)
    det[1, 0] = [0.9, 0.1, 0.1, 0.5, 0.5]
    offs = [rng.normal(0, 1, (12, 12, 4, 9, 2)).astype(np.float32)]
    dump_eval_visuals(str(tmp_path), 3, img, gt, det, offsets=offs,
                      image_size=96)
    files = sorted(os.listdir(tmp_path))
    assert "00003_x.npy" in files
    assert "00003_annotation.npy" in files
    assert "00003_offsets.npy" in files
    assert "00003_detection.jpg" in files
    assert "00003_offsets.jpg" in files


def test_input_grid(rng):
    imgs = rng.uniform(0, 1, (3, 32, 32, 12)).astype(np.float32)
    boxes = np.tile(np.array([[0.1, 0.1, 0.5, 0.5]]), (3, 2, 1))
    valid = np.ones((3, 2), bool)
    panel = input_grid_with_boxes(imgs, boxes, valid)
    assert panel.shape == (32, 96, 3)
