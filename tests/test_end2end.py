"""End-to-end detect path on CPU with the tiny cfg — BASELINE config #1:
'single 416x416 image inference, tiny-backbone cfg, rotated decode +
rotated NMS on CPU'."""

import os

import numpy as np
import pytest

from rotate_yolov3_tpu.data.letterbox import letterbox, letterbox_jax
from rotate_yolov3_tpu.detector import Detector, detections_to_numpy
from rotate_yolov3_tpu.ops.boxes import scale_coords_rotated

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TINY = os.path.join(ROOT, "cfg/yolov3-rotate-tiny.cfg")


@pytest.fixture(scope="module")
def detector():
    return Detector(TINY, img_size=128, conf_thres=0.2, nms_thres=0.4,
                    max_det=32)


def test_detect_shapes_and_mask(detector):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
    dets, mask = detector(img)
    assert dets.shape == (1, 32, 7)
    assert mask.shape == (1, 32)
    d = np.asarray(dets)
    assert np.all(np.isfinite(d))
    per_image = detections_to_numpy(dets, mask)
    assert len(per_image) == 1


def test_detect_batch(detector):
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (3, 128, 128, 3), dtype=np.uint8)
    dets, mask = detector(imgs)
    assert dets.shape == (3, 32, 7)
    # batch-1 equivalence
    d1, m1 = detector(imgs[0])
    np.testing.assert_allclose(np.asarray(dets[0]), np.asarray(d1[0]),
                               atol=1e-4)


def test_detect_rejects_wrong_size(detector):
    with pytest.raises(AssertionError, match="letterboxed"):
        detector(np.zeros((64, 64, 3), np.uint8))


def test_letterbox_roundtrip():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (300, 400, 3), dtype=np.uint8)
    boxed, ratio, pad = letterbox(img, new_shape=128)
    assert boxed.shape == (128, 128, 3)
    # a box at original-image center maps into letterbox coords and back
    import jax.numpy as jnp
    orig = np.array([200.0, 150.0, 80.0, 40.0, 0.5])
    lb = np.array([orig[0] * ratio + pad[0], orig[1] * ratio + pad[1],
                   orig[2] * ratio, orig[3] * ratio, orig[4]])
    back = np.asarray(scale_coords_rotated(jnp.asarray(lb), ratio, pad))
    np.testing.assert_allclose(back, orig, atol=1.0)


def test_letterbox_jax_matches_cpu_geometry():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (1, 60, 120, 3)).astype(np.float32)
    import jax.numpy as jnp
    out, ratio, pad = letterbox_jax(jnp.asarray(img), new_shape=128)
    assert out.shape == (1, 128, 128, 3)
    cpu_out, cpu_ratio, cpu_pad = letterbox(img[0].astype(np.uint8), 128)
    assert ratio == pytest.approx(cpu_ratio)
    assert pad == cpu_pad
    # padding rows are gray
    np.testing.assert_array_equal(np.asarray(out[0, :pad[1] - 1]), 128.0)


def test_full_pipeline_from_raw_image(detector):
    """letterbox -> detect -> rescale to original coords (detect.py path)."""
    rng = np.random.default_rng(4)
    raw = rng.integers(0, 255, (96, 160, 3), dtype=np.uint8)
    boxed, ratio, pad = letterbox(raw, new_shape=128)
    dets, mask = detector(boxed)
    rescaled = scale_coords_rotated(dets, ratio, pad)
    r = np.asarray(rescaled)
    assert np.all(np.isfinite(r))
    # scores/classes pass through unchanged
    np.testing.assert_allclose(r[..., 5:], np.asarray(dets)[..., 5:])


def test_multi_device_inference_matches_single_device():
    """Detector(devices=4) on the 8-virtual-device CPU mesh: batch sharded
    over the mesh, params replicated — per-image outputs equal the
    single-device detector (SURVEY §5 tile-parallelism analog)."""
    import jax

    assert len(jax.devices()) >= 4
    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 255, (8, 128, 128, 3), dtype=np.uint8)

    det1 = Detector(TINY, img_size=128, conf_thres=0.2, nms_thres=0.4,
                    max_det=32, seed=5)
    detN = Detector(TINY, img_size=128, conf_thres=0.2, nms_thres=0.4,
                    max_det=32, seed=5, devices=4)
    d1, m1 = det1(imgs)
    dN, mN = detN(imgs)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(mN))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(dN),
                               rtol=1e-5, atol=1e-5)
    # indivisible batch fails loudly
    with pytest.raises(AssertionError, match="divisible"):
        detN(imgs[:6])


def test_refresh_params_matches_fresh_detector():
    """refresh_params(new params/state) reruns the FULL fusion pipeline
    (BN fold + 1/255 input-scale fold + field-major head permutation):
    outputs must equal a Detector constructed directly from those params.
    Guards train.py's per-epoch eval refresh — assigning raw fuse_bn output
    to .fused_params skips the folds and corrupts eval silently."""
    rng = np.random.default_rng(9)
    imgs = rng.integers(0, 255, (2, 128, 128, 3), dtype=np.uint8)

    det_a = Detector(TINY, img_size=128, conf_thres=0.2, nms_thres=0.4,
                     max_det=32, seed=5)
    det_b = Detector(TINY, img_size=128, conf_thres=0.2, nms_thres=0.4,
                     max_det=32, seed=11)
    db, mb = det_b(imgs)

    det_a.refresh_params(det_b.params, det_b.state)
    da, ma = det_a(imgs)
    np.testing.assert_array_equal(np.asarray(mb), np.asarray(ma))
    np.testing.assert_allclose(np.asarray(db), np.asarray(da),
                               rtol=1e-5, atol=1e-5)
