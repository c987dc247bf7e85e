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


def test_loader_caches_match_uncached_and_invalidate(tmp_path):
    """RAM/disk image caches + label cache must be bit-identical to the
    uncached path, survive epochs, and invalidate when files change."""
    import time

    list_path = make_synthetic_dataset(str(tmp_path), n_images=4,
                                       img_size=(100, 120), seed=9)

    def all_batches(**kw):
        ds = LoadImagesAndLabels(list_path, img_size=64, batch_size=2,
                                 augment=False, max_gt=16, prefetch=0, **kw)
        return ds, [tuple(np.copy(a) for a in b) for b in iter(ds)]

    _, ref = all_batches(cache_images="", cache_labels=False)
    for mode in ("ram", "disk"):
        ds, got = all_batches(cache_images=mode)
        for (ri, rt, rv), (gi, gt, gv) in zip(ref, got):
            np.testing.assert_array_equal(ri, gi)
            np.testing.assert_array_equal(rt, gt)
            np.testing.assert_array_equal(rv, gv)
        # epoch 2 hits the cache; content identical (augment off)
        got2 = [tuple(np.copy(a) for a in b) for b in iter(ds)]
        for (ri, _, _), (gi, _, _) in zip(ref, got2):
            np.testing.assert_array_equal(ri, gi)
    # disk sidecars exist now
    sidecars = [p + ".cache.npy" for p in
                open(list_path).read().split()]
    sidecars = [s if os.path.isabs(s) else
                os.path.join(os.path.dirname(list_path), s)
                for s in sidecars]
    assert all(os.path.exists(s) for s in sidecars)

    # --- invalidation: rewrite image 0 + its label, caches must refresh ---
    import cv2
    img_path = open(list_path).read().split()[0]
    if not os.path.isabs(img_path):
        img_path = os.path.join(os.path.dirname(list_path), img_path)
    lbl_path = img_path.replace(os.sep + "images" + os.sep,
                                os.sep + "labels" + os.sep)
    lbl_path = lbl_path.rsplit(".", 1)[0] + ".txt"

    for mode in ("ram", "disk"):
        ds = LoadImagesAndLabels(list_path, img_size=64, batch_size=2,
                                 augment=False, max_gt=16, prefetch=0,
                                 cache_images=mode)
        _ = list(iter(ds))                       # populate caches
        time.sleep(0.01)
        cv2.imwrite(img_path, np.full((100, 120, 3), 200, np.uint8))
        with open(lbl_path, "w") as f:
            f.write("0 0.5 0.5 0.25 0.125 0.3\n")
        now = time.time() + 1                    # force mtime forward even
        os.utime(img_path, (now, now))           # on coarse filesystems
        os.utime(lbl_path, (now, now))
        imgs, tgts, valid = ds._make_batch([0])
        assert imgs.mean() > 150                 # new image content seen
        assert valid[0].sum() == 1               # new single-row label seen
        # cls and theta pass through letterboxing unchanged
        assert tgts[0, 0, 0] == 0.0
        np.testing.assert_allclose(tgts[0, 0, 5], 0.3, atol=1e-6)


def test_loader_multi_worker_order_and_determinism(tmp_path):
    """The ordered worker pool must yield identical batches in identical
    order regardless of worker count."""
    list_path = make_synthetic_dataset(str(tmp_path), n_images=8, seed=2)

    def run(workers):
        ds = LoadImagesAndLabels(list_path, img_size=64, batch_size=2,
                                 augment=True, hyp=Hyp(), max_gt=8, seed=5,
                                 prefetch=2, workers=workers)
        ds.set_epoch(3)
        return [tuple(np.copy(a) for a in b) for b in iter(ds)]

    one = run(1)
    four = run(4)
    assert len(one) == len(four) == 4
    for b1, b4 in zip(one, four):
        for x, y in zip(b1, b4):
            np.testing.assert_array_equal(x, y)


def test_loader_multi_scale_per_interval(tmp_path):
    """random=1 semantics: at interval=1 an epoch must see >=2 distinct
    sizes; within an interval the size is constant; draws are deterministic
    per epoch; normalized labels are size-independent."""
    list_path = make_synthetic_dataset(str(tmp_path), n_images=16, seed=4)
    ds = LoadImagesAndLabels(list_path, img_size=96, batch_size=2,
                             augment=False, max_gt=8, seed=0, prefetch=0)
    ds.set_multi_scale([64, 96, 128], interval=2)
    ds.set_epoch(0)
    sizes = [b[0].shape[1] for b in iter(ds)]
    assert len(sizes) == 8
    assert len(set(sizes)) >= 2                 # actually multi-scale
    for k in range(0, 8, 2):
        assert sizes[k] == sizes[k + 1]         # constant within interval
    ds.set_epoch(0)
    assert [b[0].shape[1] for b in iter(ds)] == sizes   # deterministic
    # disabling returns to the fixed size
    ds.set_multi_scale(None)
    assert all(b[0].shape[1] == 96 for b in iter(ds))
