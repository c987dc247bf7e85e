"""Data pipeline tests: label consistency under augmentation
(SURVEY.md §4: 'rotate image+labels, re-derive theta'), loader shapes,
synthetic dataset round-trip."""

import math
import os

import numpy as np
import pytest

from rotate_yolov3_tpu.config.hyp import Hyp
from rotate_yolov3_tpu.data.augment import (
    _corners_to_labels, _labels_to_corners, augment_hsv, flip_lr, flip_ud,
    random_affine)
from rotate_yolov3_tpu.data.datasets import (LoadImagesAndLabels,
                                             img2label_path, load_labels)
from rotate_yolov3_tpu.data.synthetic import make_synthetic_dataset


def test_corners_roundtrip():
    labels = np.array([[0, 0.5, 0.4, 0.2, 0.1, 0.7],
                       [1, 0.3, 0.6, 0.15, 0.25, -1.2]], np.float32)
    corners = _labels_to_corners(labels, 256)
    back = _corners_to_labels(corners, labels[:, 0], 256)
    np.testing.assert_allclose(back, labels, atol=1e-5)


def test_random_affine_pure_rotation_rewrites_theta():
    """Rotating the image by phi must add -phi (cv2 y-down convention) to
    every label's theta and keep w/h."""
    import cv2

    size = 256
    img = np.zeros((size, size, 3), np.uint8)
    labels = np.array([[0, 0.5, 0.5, 0.3, 0.1, 0.2]], np.float32)

    class FixedRng:
        def uniform(self, lo, hi, *a):
            # degrees draw returns 30; translate/scale draws return midpoint
            if hi == 30.0:
                return 30.0
            return (lo + hi) / 2

        def random(self):
            return 1.0

    out, new = random_affine(img, labels, degrees=30.0, translate=0.0,
                             scale=0.0, shear=0.0, rng=FixedRng())
    assert len(new) == 1
    # center box stays centered, w/h preserved under pure rotation
    np.testing.assert_allclose(new[0, 1:3], [0.5, 0.5], atol=1e-3)
    np.testing.assert_allclose(new[0, 3:5], [0.3, 0.1], atol=1e-3)
    # cv2 positive angle = CCW in y-up = CW in image coords: theta decreases
    assert new[0, 5] == pytest.approx(0.2 - math.radians(30.0), abs=1e-3)


def test_random_affine_drops_out_of_bounds():
    img = np.zeros((128, 128, 3), np.uint8)
    labels = np.array([[0, 0.02, 0.02, 0.05, 0.05, 0.0]], np.float32)
    rng = np.random.default_rng(0)
    # large translation pushes the corner box out
    kept = []
    for _ in range(20):
        _, new = random_affine(img, labels, degrees=0, translate=0.4,
                               scale=0.0, shear=0.0, rng=rng)
        kept.append(len(new))
    assert min(kept) == 0          # sometimes dropped
    assert max(kept) <= 1


def test_flips_fix_angles():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    labels = np.array([[0, 0.25, 0.75, 0.2, 0.1, 0.5]], np.float32)
    fimg, flbl = flip_lr(img, labels)
    assert flbl[0, 1] == pytest.approx(0.75)
    assert flbl[0, 5] == pytest.approx(-0.5)
    np.testing.assert_array_equal(fimg, img[:, ::-1])
    fimg2, flbl2 = flip_ud(img, labels)
    assert flbl2[0, 2] == pytest.approx(0.25)
    assert flbl2[0, 5] == pytest.approx(-0.5)


def test_augment_hsv_changes_pixels_not_shape():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    out = augment_hsv(img, 0.05, 0.5, 0.5, rng)
    assert out.shape == img.shape and out.dtype == img.dtype
    assert not np.array_equal(out, img)


def test_img2label_path():
    assert img2label_path("/d/images/a/b.jpg") == "/d/labels/a/b.txt"
    assert img2label_path("x/im.png") == "x/im.txt"


def test_synthetic_dataset_and_loader(tmp_path):
    list_path = make_synthetic_dataset(str(tmp_path), n_images=8,
                                       img_size=(160, 200), seed=3)
    assert os.path.exists(list_path)
    # labels parse and are in range
    lbl = load_labels(str(tmp_path / "labels" / "im0000.txt"))
    assert lbl.shape[1] == 6
    assert np.all(lbl[:, 1:5] > 0) and np.all(lbl[:, 1:5] < 1)

    ds = LoadImagesAndLabels(list_path, img_size=128, batch_size=4,
                             augment=False, max_gt=16, prefetch=0)
    batches = list(iter(ds))
    assert len(batches) == 2
    imgs, tgts, valid = batches[0]
    assert imgs.shape == (4, 128, 128, 3) and imgs.dtype == np.uint8
    assert tgts.shape == (4, 16, 6) and valid.shape == (4, 16)
    assert valid.any()
    # padded rows are zero
    np.testing.assert_array_equal(tgts[~valid], 0.0)


def test_loader_augment_and_determinism(tmp_path):
    list_path = make_synthetic_dataset(str(tmp_path), n_images=4, seed=1)
    ds = LoadImagesAndLabels(list_path, img_size=96, batch_size=2,
                             augment=True, hyp=Hyp(), max_gt=8, seed=7,
                             prefetch=2)
    ds.set_epoch(0)
    a1 = [b[0].copy() for b in iter(ds)]
    ds.set_epoch(0)
    a2 = [b[0].copy() for b in iter(ds)]
    for x, y in zip(a1, a2):
        np.testing.assert_array_equal(x, y)   # same epoch -> same batches
    ds.set_epoch(1)
    a3 = [b[0].copy() for b in iter(ds)]
    assert any(not np.array_equal(x, y) for x, y in zip(a1, a3))


def test_loader_label_geometry_consistency(tmp_path):
    """Labels loaded without augmentation must sit on bright pixels of the
    drawn rectangles (image/label consistency through letterboxing)."""
    list_path = make_synthetic_dataset(str(tmp_path), n_images=4,
                                       img_size=(160, 320), seed=5)
    ds = LoadImagesAndLabels(list_path, img_size=160, batch_size=4,
                             augment=False, max_gt=8, prefetch=0)
    imgs, tgts, valid = next(iter(ds))
    for b in range(4):
        for t in tgts[b][valid[b]]:
            cx, cy = int(t[1] * 160), int(t[2] * 160)
            assert imgs[b, cy, cx].max() > 100, (b, t)


def test_dataset_net_input_is_rgb(tmp_path):
    """LoadImagesAndLabels batches are RGB (converted from cv2 BGR)."""
    import cv2

    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    img = np.zeros((64, 64, 3), np.uint8)
    img[..., 0] = 200                      # blue in BGR
    cv2.imwrite(str(img_dir / "b.png"), img)
    (lbl_dir / "b.txt").write_text("0 0.5 0.5 0.2 0.1 0.0\n")
    lst = tmp_path / "list.txt"
    lst.write_text(str(img_dir / "b.png") + "\n")

    ds = LoadImagesAndLabels(str(lst), img_size=64, batch_size=1,
                             augment=False, prefetch=0)
    imgs, tgts, valid = next(iter(ds))
    assert imgs[0, 32, 32, 2] == 200 and imgs[0, 32, 32, 0] == 0   # RGB
