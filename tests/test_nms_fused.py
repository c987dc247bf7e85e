"""Fused single-kernel NMS (ops.nms_pallas, interpret mode) equivalence.

The fused kernel must make EXACTLY the keep decisions of the two-stage r3
path it replaces (kill-mask kernel + XLA greedy fixpoint) — same divide-free
threshold predicate, same fixpoint iteration — and therefore also match the
pure-jnp IoU-matrix + fixpoint oracle on data away from the threshold
boundary (the only place the divide-free form can differ, by FP rounding).
"""

import jax.numpy as jnp
import numpy as np

from rotate_yolov3_tpu.ops.nms_pallas import nms_greedy_pallas
from rotate_yolov3_tpu.ops.rotated_nms import (greedy_suppress_fixpoint,
                                               greedy_suppress_fixpoint_kill)
from rotate_yolov3_tpu.ops.skew_iou import skew_iou_matrix
from rotate_yolov3_tpu.ops.skew_iou_pallas import skew_kill_matrix_pallas


def _random_sorted_boxes(rng, n, spread=120.0):
    """Score-sorted random rotated boxes + scores (descending)."""
    boxes = np.stack([
        rng.uniform(0, spread, n), rng.uniform(0, spread, n),
        rng.uniform(5, 40, n), rng.uniform(5, 40, n),
        rng.uniform(-np.pi, np.pi, n)], axis=1).astype(np.float32)
    scores = np.sort(rng.uniform(0.05, 1.0, n).astype(np.float32))[::-1]
    return boxes, scores.copy()


def _oracle_keep(boxes, valid, thr, cls_id=None):
    iou = skew_iou_matrix(jnp.asarray(boxes), jnp.asarray(boxes))
    if cls_id is not None:
        same = cls_id[:, None] == cls_id[None, :]
        iou = jnp.where(jnp.asarray(same), iou, 0.0)
    return np.asarray(greedy_suppress_fixpoint(
        iou, jnp.asarray(valid), thr))


def test_fused_matches_two_stage_and_oracle():
    rng = np.random.default_rng(7)
    for n, thr in ((16, 0.4), (130, 0.3), (256, 0.5)):
        boxes, _ = _random_sorted_boxes(rng, n)
        valid = rng.uniform(0, 1, n) > 0.1
        boxes = np.where(valid[:, None], boxes, 0.0).astype(np.float32)

        fused = np.asarray(nms_greedy_pallas(
            jnp.asarray(boxes)[None], None, jnp.asarray(valid)[None],
            iou_thr=thr, interpret=True))[0]

        kill = skew_kill_matrix_pallas(
            jnp.asarray(boxes), None, iou_thr=thr, interpret=True)
        two_stage = np.asarray(greedy_suppress_fixpoint_kill(
            kill != 0, jnp.asarray(valid)))

        np.testing.assert_array_equal(fused, two_stage)
        np.testing.assert_array_equal(fused, _oracle_keep(boxes, valid, thr))


def test_fused_class_aware():
    rng = np.random.default_rng(11)
    n = 64
    boxes, _ = _random_sorted_boxes(rng, n, spread=40.0)  # dense overlaps
    cls_id = rng.integers(0, 3, n).astype(np.int32)
    valid = np.ones(n, bool)

    fused = np.asarray(nms_greedy_pallas(
        jnp.asarray(boxes)[None], jnp.asarray(cls_id)[None],
        jnp.asarray(valid)[None], iou_thr=0.3, interpret=True))[0]
    kill = skew_kill_matrix_pallas(
        jnp.asarray(boxes), jnp.asarray(cls_id), iou_thr=0.3, interpret=True)
    two_stage = np.asarray(greedy_suppress_fixpoint_kill(
        kill != 0, jnp.asarray(valid)))
    np.testing.assert_array_equal(fused, two_stage)
    np.testing.assert_array_equal(
        fused, _oracle_keep(boxes, valid, 0.3, cls_id=cls_id))
    # cross-class identical boxes must NOT suppress each other
    assert fused.sum() >= len(np.unique(cls_id))


def test_fused_suppression_chain_worst_case():
    """A -> B -> C ... suppression chain: A kills B, so B must NOT kill C;
    C kills D, etc. Exercises multi-pass fixpoint convergence in-kernel."""
    n = 24
    boxes = np.zeros((n, 5), np.float32)
    for i in range(n):
        # each box overlaps its neighbour > thr but box i+2 < thr
        boxes[i] = (10.0 + 6.0 * i, 10.0, 12.0, 12.0, 0.0)
    valid = np.ones(n, bool)
    fused = np.asarray(nms_greedy_pallas(
        jnp.asarray(boxes)[None], None, jnp.asarray(valid)[None],
        iou_thr=0.3, interpret=True))[0]
    np.testing.assert_array_equal(fused, _oracle_keep(boxes, valid, 0.3))
    # alternating keep pattern is the known greedy result for a chain
    np.testing.assert_array_equal(fused, np.arange(n) % 2 == 0)


def test_fused_batched_consistency():
    """Batched call == per-image calls (grid dimension correctness)."""
    rng = np.random.default_rng(3)
    b, n = 5, 48
    boxes = np.stack([_random_sorted_boxes(rng, n, spread=60.0)[0]
                      for _ in range(b)])
    valid = np.ones((b, n), bool)
    batched = np.asarray(nms_greedy_pallas(
        jnp.asarray(boxes), None, jnp.asarray(valid),
        iou_thr=0.4, interpret=True))
    for i in range(b):
        single = np.asarray(nms_greedy_pallas(
            jnp.asarray(boxes[i])[None], None, jnp.asarray(valid[i])[None],
            iou_thr=0.4, interpret=True))[0]
        np.testing.assert_array_equal(batched[i], single)


def test_fused_bf16_mask_identical():
    """bf16 kill-scratch variant makes bit-identical keep decisions: mask
    entries are exactly 0/1 (representable in bf16) and the fixpoint matvec
    accumulates f32, so only VMEM bytes change, never results."""
    rng = np.random.default_rng(19)
    for n, thr in ((64, 0.4), (256, 0.3)):
        boxes, _ = _random_sorted_boxes(rng, n, spread=80.0)
        cls_id = rng.integers(0, 4, n).astype(np.int32)
        valid = rng.uniform(0, 1, n) > 0.05
        boxes = np.where(valid[:, None], boxes, 0.0).astype(np.float32)
        f32 = np.asarray(nms_greedy_pallas(
            jnp.asarray(boxes)[None], jnp.asarray(cls_id)[None],
            jnp.asarray(valid)[None], iou_thr=thr, interpret=True))[0]
        bf16 = np.asarray(nms_greedy_pallas(
            jnp.asarray(boxes)[None], jnp.asarray(cls_id)[None],
            jnp.asarray(valid)[None], iou_thr=thr, interpret=True,
            mask_dtype="bfloat16"))[0]
        np.testing.assert_array_equal(f32, bf16)
        np.testing.assert_array_equal(
            f32, _oracle_keep(boxes, valid, thr, cls_id=cls_id))


def test_fused_all_invalid_and_empty_overlap():
    boxes = np.zeros((1, 8, 5), np.float32)
    valid = np.zeros((1, 8), bool)
    keep = np.asarray(nms_greedy_pallas(
        jnp.asarray(boxes), None, jnp.asarray(valid),
        iou_thr=0.4, interpret=True))
    assert not keep.any()
    # disjoint boxes: everything valid survives (fixpoint exits pass 1)
    boxes = np.array([[[10, 10, 5, 5, 0.2], [50, 50, 5, 5, 1.0],
                       [90, 90, 5, 5, -0.7], [130, 130, 5, 5, 0.0]]],
                     np.float32)
    valid = np.ones((1, 4), bool)
    keep = np.asarray(nms_greedy_pallas(
        jnp.asarray(boxes), None, jnp.asarray(valid),
        iou_thr=0.4, interpret=True))
    assert keep.all()
