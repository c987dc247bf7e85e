"""Fixed-shape rotated NMS vs the O(n^2) numpy greedy oracle (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rotate_yolov3_tpu.ops.rotated_nms import (greedy_suppress,
                                               non_max_suppression)
from rotate_yolov3_tpu.ops.skew_iou import skew_iou_matrix

from oracles import greedy_rotated_nms_np, skew_iou_np


def _random_boxes(rng, n, spread=100.0):
    return np.stack([
        rng.uniform(0, spread, n), rng.uniform(0, spread, n),
        rng.uniform(5, 30, n), rng.uniform(5, 30, n),
        rng.uniform(-np.pi / 2, np.pi / 2, n)], axis=1).astype(np.float32)


def test_greedy_suppress_matches_oracle():
    rng = np.random.default_rng(0)
    for trial in range(5):
        n = 40
        boxes = _random_boxes(rng, n, spread=60.0)
        scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
        order = np.argsort(-scores, kind="stable")
        sboxes, sscores = boxes[order], scores[order]

        iou = skew_iou_matrix(jnp.asarray(sboxes), jnp.asarray(sboxes))
        keep = np.asarray(greedy_suppress(
            iou, jnp.ones(n, bool), iou_thr=0.3))
        kept_sorted = set(np.nonzero(keep)[0])

        oracle_keep = greedy_rotated_nms_np(sboxes, sscores, 0.3)
        assert kept_sorted == set(oracle_keep.tolist()), f"trial {trial}"


def _make_pred(boxes, scores, cls_onehot):
    """Assemble (N, 6+nc) decoded predictions with obj=score, cls=onehot."""
    n, nc = cls_onehot.shape
    return np.concatenate(
        [boxes, scores[:, None], cls_onehot], axis=1).astype(np.float32)


def test_nms_end_to_end_single_class():
    rng = np.random.default_rng(1)
    n = 64
    boxes = _random_boxes(rng, n, spread=80.0)
    scores = rng.uniform(0.0, 1.0, n).astype(np.float32)
    pred = _make_pred(boxes, scores, np.ones((n, 1), np.float32))
    # max_det >= candidate count so the oracle comparison is exact
    dets, mask = jax.jit(
        lambda p: non_max_suppression(p, conf_thres=0.25, nms_thres=0.3,
                                      max_det=64))(pred[None])
    dets, mask = np.asarray(dets[0]), np.asarray(mask[0])
    assert dets.shape == (64, 7) and mask.shape == (64,)

    # oracle: same conf filter + greedy on survivors
    sel = scores >= 0.25
    okeep = greedy_rotated_nms_np(boxes[sel], scores[sel], 0.3)
    o_boxes = boxes[sel][okeep]
    o_scores = scores[sel][okeep]
    got = dets[mask]
    assert len(got) == len(o_boxes)
    # both sorted by score descending
    np.testing.assert_allclose(got[:, 5], np.sort(o_scores)[::-1], atol=1e-5)
    order = np.argsort(-o_scores, kind="stable")
    np.testing.assert_allclose(got[:, :5], o_boxes[order], atol=1e-3)


def test_nms_scores_sorted_and_padding_zero():
    rng = np.random.default_rng(2)
    n = 30
    pred = _make_pred(_random_boxes(rng, n), rng.uniform(0, 1, n),
                      np.ones((n, 1), np.float32))
    dets, mask = non_max_suppression(jnp.asarray(pred[None]),
                                     conf_thres=0.5, nms_thres=0.4,
                                     max_det=16)
    dets, mask = np.asarray(dets[0]), np.asarray(mask[0])
    s = dets[mask][:, 5]
    assert np.all(np.diff(s) <= 1e-6)
    np.testing.assert_array_equal(dets[~mask], 0.0)


def test_nms_multiclass_no_cross_class_suppression():
    # two identical boxes, different classes, both must survive
    box = np.array([50, 50, 20, 10, 0.3], np.float32)
    boxes = np.stack([box, box])
    cls = np.zeros((2, 3), np.float32)
    cls[0, 0] = 1.0
    cls[1, 2] = 1.0
    pred = _make_pred(boxes, np.array([0.9, 0.8], np.float32), cls)
    dets, mask = non_max_suppression(jnp.asarray(pred[None]),
                                     conf_thres=0.1, nms_thres=0.3,
                                     max_det=8)
    dets, mask = np.asarray(dets[0]), np.asarray(mask[0])
    assert mask.sum() == 2
    assert set(dets[mask][:, 6].astype(int)) == {0, 2}
    # same class -> one suppressed
    cls_same = np.zeros((2, 3), np.float32)
    cls_same[:, 1] = 1.0
    pred2 = _make_pred(boxes, np.array([0.9, 0.8], np.float32), cls_same)
    _, mask2 = non_max_suppression(jnp.asarray(pred2[None]),
                                   conf_thres=0.1, nms_thres=0.3, max_det=8)
    assert np.asarray(mask2[0]).sum() == 1


def test_nms_multiclass_high_class_ids_match_per_class_oracle():
    """15-class (DOTA-scale) NMS at 608-px coordinates must match a
    per-class numpy oracle exactly — the regression test for the old
    class-offset coordinate trick, whose 1e5*cls translation pushed centers
    to ~1.5e6 where fp32 ulp is 0.125 px and near-threshold IoUs flipped."""
    rng = np.random.default_rng(7)
    n, nc = 96, 15
    boxes = np.stack([
        rng.uniform(500, 608, n), rng.uniform(500, 608, n),
        rng.uniform(5, 40, n), rng.uniform(5, 40, n),
        rng.uniform(-np.pi / 2, np.pi / 2, n)], axis=1).astype(np.float32)
    scores = rng.uniform(0.3, 1.0, n).astype(np.float32)
    cls_id = rng.integers(0, nc, n)
    onehot = np.zeros((n, nc), np.float32)
    onehot[np.arange(n), cls_id] = 1.0
    pred = _make_pred(boxes, scores, onehot)

    dets, mask = non_max_suppression(jnp.asarray(pred[None]),
                                     conf_thres=0.25, nms_thres=0.3,
                                     max_det=n)
    got = np.asarray(dets[0])[np.asarray(mask[0])]

    # oracle: per-class greedy NMS, concatenated
    kept = []
    for c in range(nc):
        sel = np.nonzero(cls_id == c)[0]
        if not len(sel):
            continue
        k = greedy_rotated_nms_np(boxes[sel], scores[sel], 0.3)
        kept.extend(sel[k].tolist())
    kept = sorted(kept, key=lambda i: -scores[i])
    assert len(got) == len(kept)
    np.testing.assert_allclose(got[:, :5], boxes[kept], atol=1e-4)
    np.testing.assert_array_equal(got[:, 6].astype(int), cls_id[kept])


def test_nms_conf_threshold_empties():
    rng = np.random.default_rng(3)
    n = 10
    pred = _make_pred(_random_boxes(rng, n),
                      np.full(n, 0.01, np.float32),
                      np.ones((n, 1), np.float32))
    dets, mask = non_max_suppression(jnp.asarray(pred[None]),
                                     conf_thres=0.5, nms_thres=0.4,
                                     max_det=8)
    assert np.asarray(mask).sum() == 0
    np.testing.assert_array_equal(np.asarray(dets), 0.0)


def test_nms_batch_independence():
    rng = np.random.default_rng(4)
    n = 20
    p1 = _make_pred(_random_boxes(rng, n), rng.uniform(0, 1, n),
                    np.ones((n, 1), np.float32))
    p2 = _make_pred(_random_boxes(rng, n), rng.uniform(0, 1, n),
                    np.ones((n, 1), np.float32))
    batch = jnp.asarray(np.stack([p1, p2]))
    dets_b, mask_b = non_max_suppression(batch, 0.2, 0.4, max_det=16)
    dets_1, mask_1 = non_max_suppression(jnp.asarray(p1[None]), 0.2, 0.4,
                                         max_det=16)
    np.testing.assert_allclose(np.asarray(dets_b[0]), np.asarray(dets_1[0]),
                               atol=1e-6)


def test_nms_approx_top_k_path():
    """strided_topk path: same API/shape; exact on small inputs
    (N < 2*num_bins is an exact passthrough, ops/topk.py)."""
    rng = np.random.default_rng(5)
    n = 64
    pred = _make_pred(_random_boxes(rng, n), rng.uniform(0, 1, n),
                      np.ones((n, 1), np.float32))
    d1, m1 = non_max_suppression(jnp.asarray(pred[None]), 0.2, 0.4,
                                 max_det=16, approx_top_k=True)
    d2, m2 = non_max_suppression(jnp.asarray(pred[None]), 0.2, 0.4,
                                 max_det=16, approx_top_k=False)
    assert d1.shape == d2.shape
    # small-N approx_max_k is exact: results match the exact path
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)


def test_fused_nms_matches_decode_all_path():
    """Score-first fused NMS == decode_all + classic NMS on the same raw
    heads (exact top-k on both sides)."""
    import os
    from rotate_yolov3_tpu.config.parse import parse_model_cfg
    from rotate_yolov3_tpu.models import (apply_network, build_network,
                                          decode_all, init_params)
    from rotate_yolov3_tpu.ops.rotated_nms import non_max_suppression_fused

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = build_network(
        parse_model_cfg(os.path.join(root, "cfg/yolov3-rotate-tiny.cfg")),
        img_size=96)
    params, state = init_params(spec, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 96, 96, 3))
    heads, _ = apply_network(spec, params, state, x, train=False)
    heads = [h.astype(jnp.float32) for h in heads]

    pred = decode_all(heads, spec.yolo_specs)
    d_ref, m_ref = non_max_suppression(pred, conf_thres=0.2, nms_thres=0.4,
                                       max_det=32)
    d_fused, m_fused = non_max_suppression_fused(
        heads, spec.yolo_specs, conf_thres=0.2, nms_thres=0.4, max_det=32,
        approx_top_k=False)
    np.testing.assert_array_equal(np.asarray(m_ref), np.asarray(m_fused))
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_fused),
                               rtol=1e-5, atol=1e-5)


def test_approx_topk_equivalence_on_detection_landscape():
    """approx (now strided_topk) == exact top-k through full NMS on a
    detection-shaped score landscape: a few strong per-object peaks over a
    sub-threshold background. Historical note: this test's evenly-spread
    peaks were the landscape the retired lax.approx_max_k default passed —
    the ADJACENT-peak landscape it failed lives in tests/test_topk.py,
    which is why approx_max_k was replaced (VERDICT r3 weak #3)."""
    rng = np.random.default_rng(17)
    n, n_obj = 8192, 12
    boxes = _random_boxes(rng, n)
    scores = rng.uniform(0.0, 0.15, n)            # background < conf
    # peaks evenly spread over the index space — distinct objects live in
    # distinct grid cells, so their flat indices (and approx-top-k buckets,
    # which are contiguous index ranges) are far apart
    stride = n // (2 * n_obj)
    peak_idx = np.arange(n_obj) * 2 * stride + 3
    scores[peak_idx] = rng.uniform(0.55, 0.95, n_obj)
    # give each peak a same-center duplicate at slightly lower score: NMS
    # must suppress it identically on both paths
    dup_idx = peak_idx + stride
    boxes[dup_idx] = boxes[peak_idx] + rng.normal(0, 0.5, (n_obj, 5))
    scores[dup_idx] = scores[peak_idx] - 0.1
    pred = _make_pred(boxes, scores, np.ones((n, 1), np.float32))

    d_ex, m_ex = non_max_suppression(jnp.asarray(pred[None]), 0.3, 0.4,
                                     max_det=64, approx_top_k=False)
    d_ap, m_ap = non_max_suppression(jnp.asarray(pred[None]), 0.3, 0.4,
                                     max_det=64, approx_top_k=True)
    assert int(np.asarray(m_ex).sum()) > 0
    np.testing.assert_array_equal(np.asarray(m_ex), np.asarray(m_ap))
    np.testing.assert_allclose(np.asarray(d_ex), np.asarray(d_ap),
                               rtol=1e-5, atol=1e-5)


def test_detector_topk_default_exact_off_tpu():
    from rotate_yolov3_tpu.detector import Detector

    det = Detector("cfg/yolov3-rotate-tiny.cfg", img_size=96)
    assert det.approx_top_k is False      # CPU backend in tests


def test_fixpoint_greedy_equals_sequential_greedy():
    """greedy_suppress_fixpoint == greedy_suppress (exact, all inputs):
    random IoU matrices incl. long suppression chains and ties near thr."""
    from rotate_yolov3_tpu.ops.rotated_nms import greedy_suppress_fixpoint

    rng = np.random.default_rng(0)
    for trial in range(20):
        k = int(rng.integers(4, 160))
        iou = rng.uniform(0, 1, (k, k)).astype(np.float32)
        iou = np.maximum(iou, iou.T)
        np.fill_diagonal(iou, 1.0)
        valid = rng.uniform(0, 1, k) > 0.2
        thr = float(rng.uniform(0.2, 0.8))
        a = np.asarray(greedy_suppress(jnp.asarray(iou),
                                       jnp.asarray(valid), thr))
        b = np.asarray(greedy_suppress_fixpoint(jnp.asarray(iou),
                                                jnp.asarray(valid), thr))
        np.testing.assert_array_equal(a, b)

    # adversarial: a pure chain 0->1->2->...->k (worst-case depth)
    k = 64
    iou = np.zeros((k, k), np.float32)
    for i in range(k - 1):
        iou[i, i + 1] = iou[i + 1, i] = 0.9
    valid = np.ones(k, bool)
    a = np.asarray(greedy_suppress(jnp.asarray(iou), jnp.asarray(valid), 0.5))
    from rotate_yolov3_tpu.ops.rotated_nms import greedy_suppress_fixpoint
    b = np.asarray(greedy_suppress_fixpoint(jnp.asarray(iou),
                                            jnp.asarray(valid), 0.5))
    np.testing.assert_array_equal(a, b)
    # chain semantics: evens kept, odds suppressed
    np.testing.assert_array_equal(b, np.arange(k) % 2 == 0)


def test_field_major_heads_bit_identical():
    """Field-major head-channel permutation + matching score/decode paths
    produce EXACTLY the canonical fused-NMS results (the permutation is a
    pure channel reorder; detector applies it for lane-contiguous scores)."""
    import os
    from rotate_yolov3_tpu.config.parse import parse_model_cfg
    from rotate_yolov3_tpu.models import build_network, init_params
    from rotate_yolov3_tpu.models.darknet import apply_fused, fuse_bn, _layer_key
    from rotate_yolov3_tpu.models.yolo_head import field_major_perm
    from rotate_yolov3_tpu.ops.rotated_nms import non_max_suppression_fused

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = build_network(
        parse_model_cfg(os.path.join(root, "cfg/yolov3-rotate-tiny.cfg")),
        img_size=96)
    params, state = init_params(spec, jax.random.PRNGKey(0))
    fused = fuse_bn(spec, params, state)
    fused_fm = dict(fused)
    for ys in spec.yolo_specs:
        conv = next(l for l in spec.layers
                    if getattr(l, "index", None) == ys.index - 1)
        key = _layer_key(conv.index)
        perm = field_major_perm(ys)
        e = dict(fused_fm[key])
        e["kernel"] = e["kernel"][..., perm]
        e["bias"] = e["bias"][perm]
        fused_fm[key] = e

    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 96, 96, 3))
    heads = [h.astype(jnp.float32) for h in apply_fused(spec, fused, x)]
    heads_fm = [h.astype(jnp.float32) for h in apply_fused(spec, fused_fm, x)]

    d1, m1 = non_max_suppression_fused(
        heads, spec.yolo_specs, conf_thres=0.2, nms_thres=0.4, max_det=32,
        approx_top_k=False)
    d2, m2 = non_max_suppression_fused(
        heads_fm, spec.yolo_specs, conf_thres=0.2, nms_thres=0.4,
        max_det=32, approx_top_k=False, field_major=True)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_field_major_multiclass_bit_identical():
    """nc>1 exercises the multi-class branches of the field-major paths:
    head_scores' per-class lane-slice max chain and decode_gathered's cls
    handling (the nc=1 test above covers only the single-class slices).
    Synthetic raw heads, no network: permuting channels anchor-major ->
    field-major must leave fused-NMS outputs bit-identical."""
    from rotate_yolov3_tpu.models.darknet import YoloSpec
    from rotate_yolov3_tpu.models.yolo_head import field_major_perm
    from rotate_yolov3_tpu.ops.rotated_nms import non_max_suppression_fused

    nc = 15
    specs = [
        YoloSpec(index=10, anchors_wh=((40.0, 20.0), (24.0, 24.0)),
                 anchor_angles=(-0.5, 0.0, 0.5), num_classes=nc,
                 stride=16, ignore_thresh=0.5),
        YoloSpec(index=20, anchors_wh=((16.0, 8.0), (12.0, 12.0)),
                 anchor_angles=(-0.5, 0.0, 0.5), num_classes=nc,
                 stride=8, ignore_thresh=0.5),
    ]
    rng = np.random.default_rng(7)
    heads, heads_fm = [], []
    for s, g in zip(specs, (6, 12)):
        raw = rng.normal(size=(2, g, g, s.na * s.no)).astype(np.float32)
        heads.append(jnp.asarray(raw))
        heads_fm.append(jnp.asarray(raw[..., field_major_perm(s)]))

    d1, m1 = non_max_suppression_fused(
        heads, specs, conf_thres=0.2, nms_thres=0.4, max_det=32,
        approx_top_k=False)
    d2, m2 = non_max_suppression_fused(
        heads_fm, specs, conf_thres=0.2, nms_thres=0.4, max_det=32,
        approx_top_k=False, field_major=True)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
