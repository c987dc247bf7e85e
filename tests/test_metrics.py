"""Evaluation metric tests: matching rules, AP math."""

import numpy as np
import pytest

from rotate_yolov3_tpu.eval.metrics import (ap_per_class, compute_ap,
                                            match_image, summarize)


def _det(cx, cy, w, h, th, score, cls):
    return [cx, cy, w, h, th, score, cls]


def test_match_perfect_detection():
    gts = np.array([[50, 50, 20, 10, 0.3]], np.float32)
    dets = np.array([_det(50, 50, 20, 10, 0.3, 0.9, 0)], np.float32)
    tp = match_image(dets, gts, np.array([0]))
    assert tp.tolist() == [True]


def test_match_each_gt_once():
    gts = np.array([[50, 50, 20, 10, 0.0]], np.float32)
    dets = np.array([_det(50, 50, 20, 10, 0.0, 0.9, 0),
                     _det(51, 50, 20, 10, 0.0, 0.8, 0)], np.float32)
    tp = match_image(dets, gts, np.array([0]))
    assert tp.tolist() == [True, False]   # duplicate is FP


def test_match_class_must_agree():
    gts = np.array([[50, 50, 20, 10, 0.0]], np.float32)
    dets = np.array([_det(50, 50, 20, 10, 0.0, 0.9, 2)], np.float32)
    tp = match_image(dets, gts, np.array([0]))
    assert tp.tolist() == [False]


def test_match_iou_threshold():
    gts = np.array([[50, 50, 20, 10, 0.0]], np.float32)
    dets = np.array([_det(80, 80, 20, 10, 0.0, 0.9, 0)], np.float32)
    tp = match_image(dets, gts, np.array([0]), iou_thr=0.5)
    assert tp.tolist() == [False]


def test_match_rotation_matters():
    # same center/wh but rotated 90deg: thin boxes -> IoU ~1/7 < 0.5
    gts = np.array([[50, 50, 40, 6, 0.0]], np.float32)
    dets = np.array([_det(50, 50, 40, 6, np.pi / 2, 0.9, 0)], np.float32)
    tp = match_image(dets, gts, np.array([0]), iou_thr=0.5)
    assert tp.tolist() == [False]


def test_compute_ap_perfect_and_zero():
    # perfect detector: P=1 at all recalls
    assert compute_ap(np.array([0.5, 1.0]),
                      np.array([1.0, 1.0])) == pytest.approx(1.0)
    assert compute_ap(np.array([0.0]), np.array([0.0]),
                      method="11point") == pytest.approx(0.0, abs=0.1)


def test_ap_per_class_mixed():
    # 2 GT of class 0; det1 TP (conf .9), det2 FP (conf .8)
    tp = np.array([True, False])
    conf = np.array([0.9, 0.8])
    pred_cls = np.array([0, 0])
    target_cls = np.array([0, 0])
    p, r, ap, f1, classes = ap_per_class(tp, conf, pred_cls, target_cls)
    assert classes.tolist() == [0]
    assert r[0] == pytest.approx(0.5)
    assert p[0] == pytest.approx(0.5)
    assert 0.4 < ap[0] <= 0.55


def test_summarize_end_to_end():
    stats = [
        (np.array([True]), np.array([0.9]), np.array([0]), np.array([0])),
        (np.array([True, False]), np.array([0.8, 0.7]),
         np.array([1, 1]), np.array([1])),
    ]
    out = summarize(stats, names=["a", "b"])
    assert out["map"] > 0.5
    assert {r["name"] for r in out["per_class"]} == {"a", "b"}
    # class a perfect
    row_a = [r for r in out["per_class"] if r["name"] == "a"][0]
    assert row_a["ap"] == pytest.approx(1.0)


def test_summarize_empty():
    assert summarize([])["map"] == 0.0
