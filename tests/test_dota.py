"""DOTA devkit equivalents: formats, tile split, cross-tile merge, Task-1
eval, native polyiou (SURVEY.md §2 DOTA rows; BASELINE config #3)."""

import math
import os

import numpy as np
import pytest

from rotate_yolov3_tpu.data.dota.evaluation import evaluate_task1
from rotate_yolov3_tpu.data.dota.formats import (
    objs_to_labels, parse_dota_annotation, poly_to_rbox, rbox_to_poly,
    write_dota_annotation)
from rotate_yolov3_tpu.data.dota.img_split import (
    parse_tile_name, split_image, tile_name, tile_origins)
from rotate_yolov3_tpu.data.dota.result_merge import (
    merge_tile_detections, nms_rotated_np, write_task1_results)
from rotate_yolov3_tpu.native import polyiou_native as pn


# ----------------------------- formats ------------------------------------

def test_poly_rbox_roundtrip():
    poly = rbox_to_poly(100, 80, 40, 20, 0.4)
    cx, cy, w, h, th = poly_to_rbox(poly)
    back = rbox_to_poly(cx, cy, w, h, th)
    # minAreaRect may permute w/h + rotate 90deg; compare vertex sets
    d = np.abs(np.sort(poly, axis=0) - np.sort(back, axis=0)).max()
    assert d < 0.5
    assert w * h == pytest.approx(800, rel=0.01)


def test_annotation_io(tmp_path):
    objs = [{"poly": rbox_to_poly(50, 60, 30, 10, 0.3), "name": "ship",
             "difficult": 0},
            {"poly": rbox_to_poly(90, 20, 12, 8, -0.9), "name": "plane",
             "difficult": 1}]
    p = str(tmp_path / "ann.txt")
    write_dota_annotation(p, objs)
    back = parse_dota_annotation(p)
    assert [o["name"] for o in back] == ["ship", "plane"]
    assert back[1]["difficult"] == 1
    np.testing.assert_allclose(back[0]["poly"], objs[0]["poly"], atol=0.1)
    labels = objs_to_labels(back, ["plane", "ship"], 100, 100)
    assert labels.shape == (2, 6)
    labels_easy = objs_to_labels(back, ["plane", "ship"], 100, 100,
                                 skip_difficult=True)
    assert labels_easy.shape == (1, 6) and labels_easy[0, 0] == 1  # ship


def test_annotation_header_skip(tmp_path):
    p = str(tmp_path / "h.txt")
    with open(p, "w") as f:
        f.write("imagesource:GoogleEarth\ngsd:0.1\n"
                "0 0 10 0 10 10 0 10 ship 0\n")
    objs = parse_dota_annotation(p)
    assert len(objs) == 1 and objs[0]["name"] == "ship"


# ----------------------------- split --------------------------------------

def test_tile_origins_cover():
    origins = tile_origins(2300, 1500, subsize=1024, gap=200)
    xs = {x for x, _ in origins}
    ys = {y for _, y in origins}
    assert max(xs) + 1024 >= 2300 and max(ys) + 1024 >= 1500
    assert (0, 0) in origins
    # small image: single tile at origin
    assert tile_origins(500, 400, 1024, 200) == [(0, 0)]


def test_split_image_remaps_and_filters():
    img = np.zeros((1500, 2000, 3), np.uint8)
    objs = [
        {"poly": rbox_to_poly(100, 100, 60, 30, 0.2), "name": "a"},   # tile(0,0)
        {"poly": rbox_to_poly(1020, 100, 60, 30, 0.0), "name": "b"},  # straddles
    ]
    tiles = split_image(img, objs, subsize=1024, gap=200, keep_frac=0.7)
    by_origin = {o: t_objs for o, _, t_objs in tiles}
    t00 = by_origin[(0, 0)]
    names = [o["name"] for o in t00]
    # "b" straddles the tile edge with only ~57% inside -> dropped by
    # keep_frac from tile (0,0); it appears whole in tile (824, 0) below
    assert names == ["a"]
    a = [o for o in t00 if o["name"] == "a"][0]
    np.testing.assert_allclose(a["poly"].mean(axis=0), [100, 100], atol=1.0)
    # all tiles are exactly subsize (padded if needed)
    for _, tile, _ in tiles:
        assert tile.shape[:2] == (1024, 1024)
    # object b fully inside tile (824, 0): appears there shifted
    assert any((o2 == (824, 0) and any(ob["name"] == "b" for ob in t))
               for o2, _, t in tiles)


def test_tile_name_roundtrip():
    n = tile_name("P0001", 824, 600)
    assert parse_tile_name(n) == ("P0001", 1.0, 824, 600)


# ----------------------------- merge --------------------------------------

def test_merge_shifts_and_nms():
    # the same physical object detected in two overlapping tiles
    det_a = np.array([[900, 500, 40, 20, 0.3, 0.9, 0]], np.float32)
    det_b = np.array([[76, 500, 40, 20, 0.3, 0.8, 0]], np.float32)  # 824+76=900
    merged = merge_tile_detections({
        tile_name("P1", 0, 0): det_a,
        tile_name("P1", 824, 0): det_b,
    }, nms_thres=0.3)
    assert set(merged) == {"P1"}
    out = merged["P1"]
    assert len(out) == 1                      # duplicate suppressed
    assert out[0, 5] == pytest.approx(0.9)    # higher score kept
    np.testing.assert_allclose(out[0, :2], [900, 500], atol=0.5)


def test_merge_scaled_tiles_map_to_source_coords():
    """Devkit 'base__scale__x___y' semantics: (x0, y0) is the tile origin in
    the RESIZED image, so tile->source is (coord + origin) / scale. A 0.5x
    tile set must land detections at the same source position as a 1x set."""
    # source-image object at (900, 500), size 40x20
    det_1x = np.array([[76, 500, 40, 20, 0.3, 0.8, 0]], np.float32)
    merged_1x = merge_tile_detections(
        {tile_name("P3", 824, 0, scale=1.0): det_1x}, 0.3)
    # same object seen in a 0.5x-resized split: resized coords are halved;
    # tile origin (412, 0) is in resized coords, in-tile center (38, 250)
    det_05 = np.array([[38, 250, 20, 10, 0.3, 0.8, 0]], np.float32)
    merged_05 = merge_tile_detections(
        {tile_name("P3", 412, 0, scale=0.5): det_05}, 0.3)
    np.testing.assert_allclose(merged_05["P3"][0, :5],
                               merged_1x["P3"][0, :5], atol=1e-4)
    np.testing.assert_allclose(merged_1x["P3"][0, :2], [900, 500], atol=1e-4)
    # multi-scale: both tile sets together merge to ONE detection
    both = merge_tile_detections(
        {tile_name("P3", 824, 0, scale=1.0): det_1x,
         tile_name("P3", 412, 0, scale=0.5): det_05}, nms_thres=0.3)
    assert len(both["P3"]) == 1


def test_merge_keeps_distinct_and_classes():
    d = np.array([[100, 100, 40, 20, 0.0, 0.9, 0],
                  [100, 100, 40, 20, 0.0, 0.8, 1]], np.float32)
    merged = merge_tile_detections({tile_name("P2", 0, 0): d}, 0.3)
    assert len(merged["P2"]) == 2             # different classes survive


def test_nms_rotated_np_matches_oracle():
    from oracles import greedy_rotated_nms_np
    rng = np.random.default_rng(0)
    boxes = np.stack([rng.uniform(0, 100, 30), rng.uniform(0, 100, 30),
                      rng.uniform(5, 30, 30), rng.uniform(5, 30, 30),
                      rng.uniform(-1.5, 1.5, 30)], 1).astype(np.float32)
    scores = rng.uniform(0.1, 1, 30).astype(np.float32)
    dets = np.concatenate([boxes, scores[:, None],
                           np.zeros((30, 1))], 1).astype(np.float32)
    out = nms_rotated_np(dets, 0.3)
    oracle = greedy_rotated_nms_np(boxes, scores, 0.3)
    assert len(out) == len(oracle)
    np.testing.assert_allclose(np.sort(out[:, 5]),
                               np.sort(scores[oracle]), atol=1e-6)


# ----------------------------- eval ---------------------------------------

def test_task1_eval_end_to_end(tmp_path):
    gt_dir = tmp_path / "gt"
    det_dir = tmp_path / "dets"
    gt_dir.mkdir()
    det_dir.mkdir()
    # GT: two ships in P1, one plane in P2 (difficult)
    write_dota_annotation(str(gt_dir / "P1.txt"), [
        {"poly": rbox_to_poly(100, 100, 40, 20, 0.2), "name": "ship"},
        {"poly": rbox_to_poly(300, 200, 60, 24, -0.5), "name": "ship"},
    ])
    write_dota_annotation(str(gt_dir / "P2.txt"), [
        {"poly": rbox_to_poly(50, 50, 30, 15, 0.0), "name": "plane",
         "difficult": 1},
    ])
    merged = {
        "P1": np.array([[100, 100, 40, 20, 0.2, 0.95, 1],    # TP ship
                        [300, 200, 60, 24, -0.5, 0.90, 1],   # TP ship
                        [400, 400, 30, 30, 0.0, 0.30, 1]],   # FP ship
                       np.float32),
        "P2": np.array([[50, 50, 30, 15, 0.0, 0.80, 0]],     # difficult hit
                       np.float32),
    }
    write_task1_results(merged, ["plane", "ship"], str(det_dir))
    assert (det_dir / "Task1_ship.txt").exists()
    res = evaluate_task1(str(det_dir), str(gt_dir), ["plane", "ship"],
                         iou_thr=0.5)
    ship = [r for r in res["per_class"] if r["name"] == "ship"][0]
    assert ship["n_gt"] == 2
    assert ship["ap"] == pytest.approx(1.0, abs=0.05)   # both found first
    plane = [r for r in res["per_class"] if r["name"] == "plane"][0]
    assert plane["n_gt"] == 0   # difficult excluded; det neither TP nor FP


# ----------------------------- native -------------------------------------

def test_native_matches_jax_quad_iou():
    import jax.numpy as jnp

    from rotate_yolov3_tpu.ops.skew_iou import quad_iou
    rng = np.random.default_rng(1)
    for _ in range(20):
        q1 = rbox_to_poly(*rng.uniform(20, 80, 2), *rng.uniform(5, 40, 2),
                          rng.uniform(-3, 3))
        q2 = rbox_to_poly(*rng.uniform(20, 80, 2), *rng.uniform(5, 40, 2),
                          rng.uniform(-3, 3))
        native = pn.iou_poly(q1, q2)
        jx = float(quad_iou(jnp.asarray(q1), jnp.asarray(q2)))
        assert native == pytest.approx(jx, abs=2e-3)


def test_native_nms_and_matrix():
    boxes = np.array([[0, 0, 4, 4, 0.0], [1, 0, 4, 4, 0.0],
                      [50, 50, 4, 4, 1.0]], np.float32)
    m = pn.rbox_iou_matrix(boxes)
    assert m[0, 1] > 0.3 and m[0, 2] == 0.0
    keep = pn.rotated_nms(boxes, np.array([0.5, 0.9, 0.7]), 0.3)
    assert set(keep.tolist()) == {1, 2}   # box1 beats box0
