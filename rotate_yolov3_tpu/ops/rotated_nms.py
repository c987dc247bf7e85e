"""Fixed-shape rotated NMS + detection post-processing, fully on device.

TPU-native replacement for the reference's ``non_max_suppression`` driver +
RRPN-lineage CUDA kernel (SURVEY.md §2 "rotated NMS"). The reference returns
ragged per-image Python lists, forcing a host sync per image; XLA hates
dynamic shapes, so here every stage is fixed-shape:

  1. score = obj * max-class-prob; confidence-threshold mask;
  2. ``lax.top_k`` keeps the best ``max_det`` candidates per image
     (padding entries get score 0 / zero-area boxes — skew-IoU of a
     zero-area box is defined as 0, so they never suppress anything);
  3. pairwise skew-IoU matrix over the kept candidates (the O(K²) hot part —
     pure-jnp here, with a Pallas kernel drop-in in ``skew_iou_pallas``);
  4. greedy suppression as a fixpoint ``while_loop`` of whole-matrix
     passes (exact sequential-greedy semantics in O(chain-depth) vector
     steps; the K-step ``fori_loop`` form is kept as ``greedy_suppress``);
  5. outputs: (max_det, 7) boxes ``(cx, cy, w, h, theta, score, class)``
     sorted by score, plus a validity mask — bit-equivalent in content to
     the reference's sorted list-of-boxes, just padded.

Class-aware suppression zeroes cross-class entries of the IoU matrix
(``cls_i != cls_j -> IoU 0``) — one NMS pass instead of a per-class Python
loop, with the boxes untouched. (The earlier class-offset coordinate trick
translated centers by ``class_id * 1e5``, where fp32 ulp is ~0.125 px — a
real precision hazard at high class ids; the mask is exact and free.)
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .topk import select_topk


def _class_masked_iou(iou_matrix_fn: Callable, boxes: jnp.ndarray,
                      cls_id: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU with cross-class pairs zeroed (class-aware NMS)."""
    iou = iou_matrix_fn(boxes, boxes)
    same = cls_id[:, None] == cls_id[None, :]
    return jnp.where(same, iou, 0.0)


def _nms_keep(iou_matrix_fn: Optional[Callable], boxes: jnp.ndarray,
              cls_id: jnp.ndarray, valid: jnp.ndarray, nms_thres: float,
              use_cls: bool, iou_algo: str = "green") -> jnp.ndarray:
    """Greedy keep mask for one image's score-sorted boxes.

    Default TPU path: the fused kill-mask kernel (threshold + triangle +
    class masks applied in-kernel, int8 output — 4x less HBM than the f32
    IoU matrix; divide-free threshold form). With an explicit
    ``iou_matrix_fn`` (tests, CPU) the IoU matrix is built and thresholded
    outside — the kernel's predicate is algebraically identical
    (inter·(1+thr) > thr·(A+B) ⇔ IoU > thr), so keeps can differ only for
    pairs within FP rounding of the threshold itself (pinned in
    tests/test_nms.py / test_pallas.py).
    """
    if iou_matrix_fn is None and jax.default_backend() == "tpu":
        from .skew_iou_pallas import skew_kill_matrix_pallas

        kill = skew_kill_matrix_pallas(
            boxes, cls_id if use_cls else None, iou_thr=nms_thres,
            algo=iou_algo)
        return greedy_suppress_fixpoint_kill(kill != 0, valid)
    if iou_matrix_fn is None:
        from .skew_iou import skew_iou_matrix
        iou_matrix_fn = skew_iou_matrix
    iou = (_class_masked_iou(iou_matrix_fn, boxes, cls_id) if use_cls
           else iou_matrix_fn(boxes, boxes))
    return greedy_suppress_fixpoint(iou, valid, nms_thres)


def greedy_suppress(iou: jnp.ndarray, valid: jnp.ndarray,
                    iou_thr: float) -> jnp.ndarray:
    """Greedy NMS over a precomputed IoU matrix.

    Args:
      iou:   (K, K) pairwise IoU, rows/cols in DESCENDING score order.
      valid: (K,) candidate validity (score above threshold, not padding).
      iou_thr: suppression threshold.
    Returns:
      (K,) bool keep mask.

    Greedy NMS is inherently sequential in the kept set; the loop runs K
    steps of O(K) vector work on the VPU — with K = max_det (hundreds) this
    is negligible next to the IoU matrix build (SURVEY.md §7 "hard parts"
    (b): iterative masking keeps it on-device).
    """
    k = iou.shape[0]
    idx = jnp.arange(k)

    def body(i, suppressed):
        keep_i = valid[i] & ~suppressed[i]
        kill = keep_i & (iou[i] > iou_thr) & (idx > i)
        return suppressed | kill

    suppressed = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), bool))
    return valid & ~suppressed


def greedy_suppress_fixpoint_kill(kill: jnp.ndarray, valid: jnp.ndarray
                                  ) -> jnp.ndarray:
    """Fixpoint greedy NMS from a precomputed kill mask.

    ``kill[i, j]`` must already encode "kept row i suppresses row j":
    strictly upper-triangular (rows score-descending), thresholded, and
    class-masked — e.g. ``skew_iou_pallas.skew_kill_matrix_pallas`` output.
    See ``greedy_suppress_fixpoint`` for the fixpoint argument.
    """
    def step(keep):
        suppressed = jnp.any(keep[:, None] & kill, axis=0)
        return valid & ~suppressed

    def cond(carry):
        keep, prev, it = carry
        return jnp.any(keep != prev) & (it < kill.shape[0])

    def body(carry):
        keep, _, it = carry
        return step(keep), keep, it + 1

    keep0 = step(valid)
    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, valid, jnp.int32(0)))
    return keep


def greedy_suppress_fixpoint(iou: jnp.ndarray, valid: jnp.ndarray,
                             iou_thr: float) -> jnp.ndarray:
    """Greedy NMS as a fixpoint iteration — same result, O(depth) passes.

    The greedy keep set is the unique fixpoint of the antitone map
      F(keep)_j = valid_j & not OR_i (keep_i & i<j & iou[i,j] > thr):
    keep_0 is forced and each keep_j is determined by keep_{<j}, so any
    fixpoint equals the sequential greedy solution. Iterating F from
    keep = valid converges in (suppression-chain depth + 1) passes —
    typically 3-7 for detection data, worst-case K — each pass one
    masked (K, K) AND + OR-reduce on the VPU, instead of the K sequential
    O(K) steps of ``greedy_suppress``. Both are exact; equivalence is
    pinned in tests/test_nms.py.
    """
    kill = (iou > iou_thr) & (jnp.arange(iou.shape[0])[:, None]
                              < jnp.arange(iou.shape[0])[None, :])
    return greedy_suppress_fixpoint_kill(kill, valid)


def _nms_single(pred: jnp.ndarray, conf_thres: float, nms_thres: float,
                max_det: int, iou_matrix_fn: Callable,
                approx_top_k: bool = False, iou_algo: str = "green"
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-image NMS: (N, 6+nc) decoded preds -> ((max_det, 7), (max_det,))."""
    nc = pred.shape[-1] - 6
    boxes = pred[:, :5]
    obj = pred[:, 5]
    if nc > 1:
        cls_prob = pred[:, 6:]
        cls_id = jnp.argmax(cls_prob, axis=-1)
        score = obj * jnp.max(cls_prob, axis=-1)
    else:
        cls_id = jnp.zeros(pred.shape[0], jnp.int32)
        score = obj * pred[:, 6] if nc == 1 else obj

    conf_mask = score >= conf_thres
    ranked = jnp.where(conf_mask, score, 0.0)
    k = min(max_det, pred.shape[0])
    # approx=True -> strided-bin top-k (ops.topk): much faster than exact
    # sort over the ~1e5 candidate scores, immune to approx_max_k's
    # adjacent-cell drop, identical semantics on every backend.
    top_scores, top_idx = select_topk(ranked, k, approx_top_k)
    top_boxes = boxes[top_idx]
    top_cls = cls_id[top_idx]
    valid = top_scores > jnp.maximum(conf_thres, 0.0)
    # zero out padding boxes -> zero-area -> IoU 0 with everything
    top_boxes = jnp.where(valid[:, None], top_boxes, 0.0)

    keep = _nms_keep(iou_matrix_fn, top_boxes, top_cls, valid, nms_thres,
                     use_cls=nc > 1, iou_algo=iou_algo)

    out = jnp.concatenate(
        [top_boxes, top_scores[:, None], top_cls[:, None].astype(pred.dtype)],
        axis=-1)
    out = jnp.where(keep[:, None], out, 0.0)
    if k < max_det:
        out = jnp.pad(out, ((0, max_det - k), (0, 0)))
        keep = jnp.pad(keep, (0, max_det - k))
    return out, keep


def non_max_suppression(pred: jnp.ndarray, conf_thres: float = 0.1,
                        nms_thres: float = 0.4, max_det: int = 512,
                        iou_matrix_fn: Optional[Callable] = None,
                        approx_top_k: bool = False, iou_algo: str = "green"
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched rotated NMS: the reference's L5 public interface, fixed-shape.

    Args:
      pred: (B, N, 6+nc) decoded predictions from ``models.decode_all``.
      conf_thres, nms_thres: score / IoU thresholds (reference flag names).
      max_det: padded per-image detection capacity.
      iou_matrix_fn: pairwise-IoU implementation; defaults to the Pallas
        TPU kernel on TPU backends and the pure-jnp exact skew-IoU
        elsewhere (both produce identical results; see tests/test_pallas.py).
    Returns:
      detections (B, max_det, 7) = (cx, cy, w, h, theta, score, class),
      sorted by score descending, and validity mask (B, max_det).
    """
    single = functools.partial(_nms_single, conf_thres=conf_thres,
                               nms_thres=nms_thres, max_det=max_det,
                               iou_matrix_fn=iou_matrix_fn,
                               approx_top_k=approx_top_k, iou_algo=iou_algo)
    return jax.vmap(single)(pred)


def non_max_suppression_fused(head_raws, yolo_specs, conf_thres: float = 0.1,
                              nms_thres: float = 0.4, max_det: int = 512,
                              iou_matrix_fn: Optional[Callable] = None,
                              approx_top_k: bool = True,
                              field_major: bool = False,
                              iou_algo: str = "green",
                              fused_greedy: bool = False,
                              decode_kernel: Optional[bool] = None,
                              mask_dtype: str = "float32"
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Score-first NMS straight from raw head maps (production path).

    Equivalent results to ``decode_all`` + ``non_max_suppression`` but never
    materialises the full (B, N, 6+nc) decoded tensor: scores come from the
    raw maps (sigmoid obj*cls), top-k selects ``max_det`` candidates, and
    box decode runs on those K rows only. Default strided-bin top-k
    (``ops.topk.strided_topk``, TPU product default; exact for the parity
    path via approx_top_k=False). ``field_major``
    declares the head maps use the permuted field-major channel layout
    (``models.yolo_head.field_major_perm``) — same results, lane-contiguous
    score reads.

    ``fused_greedy``: run the kill matrix AND the greedy fixpoint inside
    one Pallas program (``ops.nms_pallas``) — the (K, K) mask never leaves
    VMEM. Identical keep decisions to the two-stage path (kill-mask kernel
    + XLA fixpoint); the r5 on-chip A/B at K=512 measured the fused kernel
    ~11 µs/img SLOWER than two-stage (1016 vs 1027 img/s, f32 mask; green2
    1021, bf16 mask 1017 — docs/PERF.md r5), so two-stage is the default
    and the fused kernel stays as an option/cross-check.
    ``decode_kernel`` (None = OFF since r5): use the one-hot-MXU
    gather+decode Pallas kernel (``ops.decode_pallas``) instead of
    ``decode_gathered``. Measured independently of ``fused_greedy`` in
    the r5 same-session ladders (identical checksums): the kernel COSTS
    ~3 µs/img at K=128 (1061.0 vs 1064.3 img/s) and ~9–11 µs/img at
    K=512 (1017.8 vs 1026.9) — the row gather + jnp decode it replaces
    is cheaper at every product capacity, so the kernel is off by
    default and stays as an option/cross-check (docs/PERF.md r5).
    ``mask_dtype="bfloat16"`` halves the fused kernel's kill scratch
    bytes with bit-identical keep decisions.
    """
    from ..models.yolo_head import decode_gathered, head_scores

    scores = jnp.concatenate(
        [head_scores(r, s, field_major=field_major)
         for r, s in zip(head_raws, yolo_specs)], axis=1)
    ranked = jnp.where(scores >= conf_thres, scores, 0.0)
    k = min(max_det, scores.shape[1])
    top_scores, top_idx = select_topk(ranked, k, approx_top_k)
    valid = top_scores > jnp.maximum(conf_thres, 0.0)

    nc = yolo_specs[0].num_classes
    nas = {s.na for s in yolo_specs}
    if decode_kernel is None:
        # r5 on-chip ladders: the decode kernel loses to gather+jnp decode
        # at both K=128 (-3 us/img) and K=512 (-9..11 us/img) — default off
        decode_kernel = False
    decoded = None
    if (decode_kernel and iou_matrix_fn is None and len(nas) == 1
            and jax.default_backend() == "tpu"):
        # single-kernel gather+decode (one-hot MXU matmul + in-kernel
        # decode, ops.decode_pallas) — same values as decode_gathered
        # within transcendental rounding
        from .decode_pallas import (decode_rows_fused_ok,
                                    decode_rows_pallas, heads_meta)

        na = yolo_specs[0].na
        no = yolo_specs[0].no
        cells_all = jnp.concatenate(
            [r.reshape(r.shape[0], -1, na * no) for r in head_raws], axis=1)
        if decode_rows_fused_ok(cells_all.shape[1], cells_all.shape[2],
                                cells_all.dtype.itemsize):
            meta = heads_meta(yolo_specs, [r.shape for r in head_raws])
            aos = decode_rows_pallas(cells_all, top_idx, valid, meta,
                                     na=na, nc=nc,
                                     field_major=field_major)
            decoded = (aos[..., :5], aos[..., 5].astype(jnp.int32))
    if decoded is None:
        rows = decode_gathered(head_raws, yolo_specs, top_idx,
                               field_major=field_major)  # (B, K, 6+nc)
        boxes = rows[..., :5]
        if nc > 1:
            cls_id = jnp.argmax(rows[..., 6:], axis=-1)
        else:
            cls_id = jnp.zeros(rows.shape[:2], jnp.int32)
        boxes = jnp.where(valid[..., None], boxes, 0.0)
    else:
        boxes, cls_id = decoded

    if (fused_greedy and iou_matrix_fn is None
            and jax.default_backend() == "tpu"):
        from .nms_pallas import nms_greedy_fused_ok, nms_greedy_pallas

        if nms_greedy_fused_ok(boxes.shape[1]):
            keep = nms_greedy_pallas(boxes, cls_id if nc > 1 else None,
                                     valid, iou_thr=nms_thres, algo=iou_algo,
                                     mask_dtype=mask_dtype)
            out = jnp.concatenate(
                [boxes, top_scores[..., None],
                 cls_id[..., None].astype(boxes.dtype)], axis=-1)
            out = jnp.where(keep[..., None], out, 0.0)
            if k < max_det:
                out = jnp.pad(out, ((0, 0), (0, max_det - k), (0, 0)))
                keep = jnp.pad(keep, ((0, 0), (0, max_det - k)))
            return out, keep

    def one(boxes_b, scores_b, cls_b, valid_b):
        keep = _nms_keep(iou_matrix_fn, boxes_b, cls_b, valid_b,
                         nms_thres, use_cls=nc > 1, iou_algo=iou_algo)
        out = jnp.concatenate(
            [boxes_b, scores_b[:, None],
             cls_b[:, None].astype(boxes_b.dtype)], axis=-1)
        return jnp.where(keep[:, None], out, 0.0), keep

    out, keep = jax.vmap(one)(boxes, top_scores, cls_id, valid)
    if k < max_det:
        out = jnp.pad(out, ((0, 0), (0, max_det - k), (0, 0)))
        keep = jnp.pad(keep, ((0, 0), (0, max_det - k)))
    return out, keep
