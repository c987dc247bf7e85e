"""Anchor-generation tool: IoU k-means + circular angle clustering.

Covers tools/kmeans_anchors.py — the rebuild of the reference lineage's
anchor-clustering scripts (SURVEY.md §2 "rotated YOLO head": anchors are a
(w,h) table replicated over angle offsets; the table itself comes from
dataset clustering in the lineage)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from kmeans_anchors import (circular_kmeans_angles, collect_wh_theta,
                            even_angle_grid, format_anchor_line,
                            kmeans_anchors, main, mean_best_iou, recall_at,
                            wh_iou)


def _clustered_wh(rng, centers, n_per=200, jitter=0.04):
    rows = []
    for cw, ch in centers:
        rows.append(np.stack([
            cw * np.exp(rng.normal(0, jitter, n_per)),
            ch * np.exp(rng.normal(0, jitter, n_per))], axis=1))
    return np.concatenate(rows)


def test_wh_iou_matches_manual():
    wh = np.array([[10.0, 20.0]])
    an = np.array([[10.0, 20.0], [20.0, 10.0], [5.0, 5.0]])
    iou = wh_iou(wh, an)[0]
    # identical box
    assert iou[0] == pytest.approx(1.0)
    # 20x10 vs 10x20 centered: inter 10*10=100, union 200+200-100
    assert iou[1] == pytest.approx(100 / 300)
    assert iou[2] == pytest.approx(25 / (200 + 25 - 25))


def test_kmeans_recovers_planted_clusters():
    rng = np.random.default_rng(0)
    centers = [(20.0, 40.0), (80.0, 30.0), (200.0, 180.0)]
    wh = _clustered_wh(rng, centers)
    anchors = kmeans_anchors(wh, 3, seed=0)
    # sorted by area: (20,40) < (80,30) < (200,180)
    want = np.array(sorted(centers, key=lambda c: c[0] * c[1]))
    assert np.all(np.abs(anchors - want) / want < 0.15)
    assert mean_best_iou(wh, anchors) > 0.85
    assert recall_at(wh, anchors, 0.5) == pytest.approx(1.0)


def test_kmeans_anchor_count_and_order():
    rng = np.random.default_rng(1)
    wh = rng.uniform(5, 300, (500, 2))
    anchors = kmeans_anchors(wh, 9, seed=1)
    assert anchors.shape == (9, 2)
    areas = anchors.prod(axis=1)
    assert np.all(np.diff(areas) >= 0)  # small -> large (cfg mask order)


def test_even_angle_grid_matches_reference_layout():
    # the committed cfg assets use -60,-30,0,30,60,90 for 6 angles
    deg = np.degrees(even_angle_grid(6))
    assert np.allclose(deg, [-60, -30, 0, 30, 60, 90])
    assert np.allclose(np.degrees(even_angle_grid(3)), [-60, 0, 60])


def test_circular_angle_kmeans_handles_mod_pi_wrap():
    rng = np.random.default_rng(2)
    # cluster at +/-85 deg: the SAME orientation cluster mod pi (rects at
    # 87 and -87 deg are 6 deg apart, not 174) plus one at 0
    a = np.concatenate([
        rng.normal(np.radians(88), 0.02, 300),
        rng.normal(np.radians(-88), 0.02, 300),
        rng.normal(0.0, 0.02, 300)])
    got = circular_kmeans_angles(a, 2, seed=0)
    got_deg = np.sort(np.degrees(got))
    # one center near 0, one near 90 (the wrapped +/-88 merge)
    assert abs(got_deg[0] - 0) < 5
    assert abs(abs(got_deg[1]) - 90) < 5


def test_collect_and_main_on_synthetic_dataset(tmp_path):
    from rotate_yolov3_tpu.data.synthetic import make_synthetic_dataset

    lst = make_synthetic_dataset(str(tmp_path), n_images=8,
                                 img_size=(160, 160), seed=3)
    wht = collect_wh_theta(lst, img_size=416)
    assert wht.shape[1] == 3
    # synthetic boxes are 0.12-0.3 x 0.05-0.15 of the image
    assert np.all(wht[:, 0] > 0) and np.all(wht[:, 0] < 416)

    anchors, angles = main(["--train", lst, "--img-size", "416",
                            "--num", "3", "--num-angles", "6"])
    assert anchors.shape == (3, 2) and angles.shape == (6,)
    line = format_anchor_line(anchors)
    assert len(line.split(",")) == 6  # "w,h, w,h, w,h"
