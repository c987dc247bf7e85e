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


def test_evaluate_dataset_dense_gt_truncation_warns(tmp_path, capsys):
    """GT beyond ``max_gt`` must be counted and warned about LOUDLY —
    silent truncation drops unmatched GT and inflates mAP (the r2
    evaluator hardcoded max_gt=256 with no warning)."""
    import os

    from rotate_yolov3_tpu.data.synthetic import make_synthetic_dataset
    from rotate_yolov3_tpu.detector import Detector
    from rotate_yolov3_tpu.eval.evaluator import evaluate_dataset

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tiny = os.path.join(root, "cfg/yolov3-rotate-tiny.cfg")
    list_path = make_synthetic_dataset(str(tmp_path), n_images=2,
                                       img_size=(96, 96), n_boxes=(12, 12),
                                       seed=5)
    det = Detector(tiny, img_size=96, conf_thres=0.2, max_det=16)

    result = evaluate_dataset(det, list_path, batch_size=2, names=["obj"],
                              max_gt=8)
    assert result["n_gt_truncated"] == 2 * (12 - 8)
    assert result["n_gt"] == 2 * 8          # only the kept GT is matchable
    assert "DROPPED" in capsys.readouterr().err

    # with enough capacity: no truncation, no warning, full GT counted
    result = evaluate_dataset(det, list_path, batch_size=2, names=["obj"],
                              max_gt=32)
    assert result["n_gt_truncated"] == 0
    assert result["n_gt"] == 2 * 12
    assert "DROPPED" not in capsys.readouterr().err


def test_eval_cli_defaults_are_accuracy_bearing():
    """test.py / dota.py detect must default to EXACT top-k and dense
    capacity: eval is the parity-measurement tool, so candidate ranking
    must match a reference that sorts exactly (the r4 strided_topk is
    adjacent-object-safe, but still reduced — tests/test_topk.py), and
    max_det=128 silently caps mAP on >128-object scenes."""
    import sys
    sys.path.insert(0, "/root/repo")
    import test as test_cli
    import dota as dota_cli

    opt = test_cli.make_parser().parse_args(["--cfg", "c", "--data", "d"])
    assert opt.max_det == 512
    assert opt.approx_topk is False
    # the wiring in test.py: approx_top_k = True if opt.approx_topk else False
    assert (True if opt.approx_topk else False) is False

    opt = dota_cli.make_parser().parse_args(
        ["detect", "--cfg", "c", "--tiles", "t", "--out", "o"])
    assert opt.max_det == 512
    assert opt.approx_topk is False


def test_evaluate_dataset_ragged_tail_single_compile(tmp_path):
    """A val set with n % batch_size != 0 must NOT trigger a second jit
    compile of the detector (the ragged-final-batch remote-recompile trap,
    CLAUDE.md rule 6): the evaluator pads the tail batch and trims stats."""
    import os

    from rotate_yolov3_tpu.data.synthetic import make_synthetic_dataset
    from rotate_yolov3_tpu.detector import Detector
    from rotate_yolov3_tpu.eval.evaluator import evaluate_dataset

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tiny = os.path.join(root, "cfg/yolov3-rotate-tiny.cfg")
    list_path = make_synthetic_dataset(str(tmp_path), n_images=5,
                                       img_size=(96, 96), seed=3)
    det = Detector(tiny, img_size=96, conf_thres=0.2, max_det=16)
    result = evaluate_dataset(det, list_path, batch_size=4, names=["obj"])
    # 5 images at bs=4 -> batches of 4 and 1(padded to 4); one compile only
    # (the serving path is the weight-baked jit by default — check the one
    # __call__ actually used)
    used_jit = det._infer_baked if det.bake_params else det._infer
    assert used_jit._cache_size() == 1
    # all 5 real images contribute stats; the 3 pad replicas do not
    assert result["n_images"] == 5
    # GT count matches the label files exactly (pad replicas would inflate)
    n_gt = 0
    with open(list_path) as f:
        for img in f.read().split():
            lbl = img.replace("/images/", "/labels/").rsplit(".", 1)[0] + ".txt"
            with open(lbl) as lf:
                n_gt += sum(1 for ln in lf if ln.strip())
    assert result["n_gt"] == n_gt
    assert len(result["per_class"]) == 1
