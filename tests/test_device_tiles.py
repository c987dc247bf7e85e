"""On-device DOTA tile pipeline (data.dota.device_tiles) equivalence.

The pipeline's NEW surface is: static-slice tile extraction, tile->source
coordinate re-map, fixed-capacity cross-tile merge NMS. The host reference
below shares the detector graph and the letterbox resize (host-vs-jax
letterbox geometry parity is pinned separately in tests/test_data.py), so
any disagreement isolates to the new surface.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from rotate_yolov3_tpu.data.dota.device_tiles import DeviceTilePipeline
from rotate_yolov3_tpu.data.dota.img_split import tile_name, tile_origins
from rotate_yolov3_tpu.data.dota.result_merge import merge_tile_detections
from rotate_yolov3_tpu.data.letterbox import letterbox_jax
from rotate_yolov3_tpu.detector import Detector
from rotate_yolov3_tpu.ops.boxes import scale_coords_rotated

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TINY = os.path.join(ROOT, "cfg/yolov3-rotate-tiny.cfg")

SUB, GAP = 384, 128


@pytest.fixture(scope="module")
def detector():
    return Detector(TINY, img_size=128, conf_thres=0.2, nms_thres=0.4,
                    max_det=32)


def _scene(h, w, seed=0):
    """Bright rotated rectangles on a dark background (cv2-drawn)."""
    import cv2

    rng = np.random.default_rng(seed)
    img = rng.integers(20, 60, (h, w, 3)).astype(np.uint8)
    for _ in range(12):
        cx, cy = rng.uniform(50, w - 50), rng.uniform(50, h - 50)
        bw, bh = rng.uniform(60, 160), rng.uniform(30, 80)
        deg = rng.uniform(-90, 90)
        pts = cv2.boxPoints(((cx, cy), (bw, bh), deg)).astype(np.int32)
        cv2.fillPoly(img, [pts], (230, 230, 230))
    return img


def test_bucket_shape_and_tile_count(detector):
    pipe = DeviceTilePipeline(detector, subsize=SUB, gap=GAP)
    hp, wp = pipe.bucket_shape(700, 900)
    slide = SUB - GAP
    assert hp >= 700 and wp >= 900
    assert (hp - SUB) % slide == 0 and (wp - SUB) % slide == 0
    # tiny sources pad up to one full tile
    assert pipe.bucket_shape(100, 100) == (SUB, SUB)
    assert pipe.num_tiles(100, 100) == 1
    assert pipe.num_tiles(700, 900) == len(
        tile_origins(wp, hp, SUB, GAP))


def test_device_pipeline_matches_host_merge(detector):
    """pipe(img) == host flow (numpy crops -> shared letterbox/detector ->
    host coordinate re-map -> host per-class merge NMS)."""
    img = _scene(700, 900)
    pipe = DeviceTilePipeline(detector, subsize=SUB, gap=GAP,
                              merge_nms_thres=0.3, max_merged=256)
    dets, mask = pipe(img)
    dev = dets[mask]

    # host reference on the same padded bucket
    hp, wp = pipe.bucket_shape(*img.shape[:2])
    padded = np.zeros((hp, wp, 3), img.dtype)
    padded[:img.shape[0], :img.shape[1]] = img
    origins = tile_origins(wp, hp, SUB, GAP)
    tiles = np.stack([padded[y:y + SUB, x:x + SUB] for (x, y) in origins])
    lb, ratio, pad = letterbox_jax(jnp.asarray(tiles, jnp.float32), 128)
    tdets, tmask = detector.infer_fn(detector.fused_params, lb)
    tdets, tmask = np.asarray(tdets), np.asarray(tmask)
    tile_txt = {}
    for (x, y), d, m in zip(origins, tdets, tmask):
        d = d[m]
        if len(d):
            d = np.asarray(scale_coords_rotated(jnp.asarray(d), ratio, pad))
        tile_txt[tile_name("img", x, y)] = d.astype(np.float32)
    host = merge_tile_detections(tile_txt, nms_thres=0.3)["img"]

    assert len(dev) == len(host), (len(dev), len(host))
    # compare as score-sorted sets (host sorts too); same boxes/scores/cls
    dev = dev[np.lexsort((dev[:, 0], -dev[:, 5]))]
    host = host[np.lexsort((host[:, 0], -host[:, 5]))]
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-3)


def test_device_pipeline_capacity_cap(detector):
    """max_merged caps output but keeps the highest-scoring rows first."""
    img = _scene(700, 900, seed=3)
    big = DeviceTilePipeline(detector, subsize=SUB, gap=GAP, max_merged=256)
    small = DeviceTilePipeline(detector, subsize=SUB, gap=GAP, max_merged=8)
    d_big, m_big = big(img)
    d_small, m_small = small(img)
    kept_big = d_big[m_big]
    kept_small = d_small[m_small]
    assert d_small.shape[0] == 8
    # every small-capacity survivor appears in the uncapped result
    for row in kept_small:
        assert np.any(np.all(np.abs(kept_big - row) < 1e-3, axis=1))


def test_tile_parallel_matches_single_device(detector):
    """Detector(devices=8) shards the tile stack over the virtual mesh;
    merged detections must equal the single-device pipeline bit-for-bit.
    700x900 @ sub=384/gap=128 gives 12 tiles — NOT a multiple of 8, so the
    zero-tile padding + mask-out path is exercised too."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device mesh")
    img = _scene(700, 900, seed=7)
    single = DeviceTilePipeline(detector, subsize=SUB, gap=GAP,
                                merge_nms_thres=0.3, max_merged=256)
    det8 = Detector(TINY, img_size=128, conf_thres=0.2, nms_thres=0.4,
                    max_det=32, devices=8)
    det8.refresh_params(detector.params, detector.state)
    sharded = DeviceTilePipeline(det8, subsize=SUB, gap=GAP,
                                 merge_nms_thres=0.3, max_merged=256)
    assert single.num_tiles(700, 900) == 12
    d1, m1 = single(img)
    d8, m8 = sharded(img)
    np.testing.assert_array_equal(m1, m8)
    np.testing.assert_allclose(d1, d8, rtol=1e-5, atol=1e-5)


def test_coordinates_are_source_frame(detector):
    """Merged detections come back in SOURCE-image pixels: inside the
    padded source frame and score-descending (random-weight nets don't
    localize, but the offset/rescale math must still map every tile-frame
    detection into the source frame — tile-frame coords would cluster in
    [0, img_size))."""
    img = _scene(700, 900, seed=5)
    pipe = DeviceTilePipeline(detector, subsize=SUB, gap=GAP,
                              max_merged=64)
    dets, mask = pipe(img)
    kept = dets[mask]
    assert len(kept) >= 1
    hp, wp = pipe.bucket_shape(700, 900)
    assert np.all(kept[:, 0] >= 0) and np.all(kept[:, 0] < wp)
    assert np.all(kept[:, 1] >= 0) and np.all(kept[:, 1] < hp)
    # some tile sits away from the origin; with 12 objects spread over the
    # scene at least one detection must land beyond one tile's extent if
    # offsets were applied (all-tile-frame coords would cap at img_size=128
    # after rescale to tile frame = 384)
    assert kept[:, :2].max() > SUB
    assert np.all(np.diff(kept[:, 5]) <= 1e-6)
