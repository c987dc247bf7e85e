"""Multi-part rotated-detection loss.

Rework of the reference's ``utils/utils.py::compute_loss`` (SURVEY.md §2
"loss"): obj BCE with ignore-region masking, cls BCE, box regression on the
cell/anchor parameterisation, smooth-L1 on the angle offset, plus the
**skew-IoU regression term** (1 - exact skewIoU between the decoded
positive prediction and its GT rotated box) that BASELINE.json's north_star
names — differentiable end-to-end through ``ops.skew_iou``.

All terms are computed on fixed-shape gathered slots (MAX_GT per image) and
dense masked grids — no ragged indices, one XLA program, vmappable and
shard_map-compatible (psum-friendly scalar outputs).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config.hyp import Hyp
from ..models.darknet import YoloSpec
from ..models.yolo_head import (ANGLE_RANGE, decode_boxes_grid, head_anchors,
                                reshape_head)
from ..ops.skew_iou import skew_iou
from .assign import HeadTargets, build_targets


def _bce_logits(logits, labels, pos_weight=1.0):
    """Numerically-stable BCE-with-logits."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * labels * log_p + (1.0 - labels) * log_not_p)


def _smooth_l1(x, beta: float = 1.0 / 9.0):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def _masked_mean(x, mask):
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def _aabb_iou(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned IoU of center-format (..., 4) = (cx, cy, w, h) boxes —
    darknet's ``box_iou``, which has no angle term."""
    half1 = b1[..., 2:4] * 0.5
    half2 = b2[..., 2:4] * 0.5
    lo = jnp.maximum(b1[..., 0:2] - half1, b2[..., 0:2] - half2)
    hi = jnp.minimum(b1[..., 0:2] + half1, b2[..., 0:2] + half2)
    wh = jnp.maximum(hi - lo, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = (b1[..., 2] * b1[..., 3] + b2[..., 2] * b2[..., 3] - inter)
    return inter / (union + 1e-9)


def objectness_ignore(raw: jnp.ndarray, gt_boxes: jnp.ndarray,
                      spec: YoloSpec,
                      rotated: bool = False) -> jnp.ndarray:
    """Darknet grid-wide objectness ignore region: (B, H, W, na) bool.

    A prediction ANYWHERE on the grid whose decoded box overlaps any GT
    with IoU > ``spec.ignore_thresh`` is excluded from the no-object
    penalty (reference ``compute_loss`` ignore-threshold masking,
    SURVEY.md §2 "loss") — suppressing e.g. neighbour cells half-covering a
    large object, which are plausible detections, not hard negatives.

    ``rotated=False`` (default, ``Hyp.rotated_ignore``) uses darknet
    ``box_iou`` semantics: axis-aligned (cx, cy, w, h), theta ignored —
    exactly what the lineage's ignore mask computes, and ~1 ms/step.
    ``rotated=True`` uses exact rotated skew-IoU instead; measured
    0.68 s/step at 608 px bs8 (the exact polygon math over every grid
    cell), so it is an accuracy experiment, not the default.

    ``gt_boxes`` is the padded (B, G, 5) pixel-box tensor; padding rows are
    zero-area so their IoU is 0 by definition and they never ignore
    anything. The G axis is scanned in CHUNKS of 8: peak memory stays at
    8 (B, H, W, na) IoU grids (~27 MB at 608/bs8) instead of G of them,
    while the scan runs G/8 sequential steps instead of G — sequential
    scan steps at this grid scale cost real dispatch/fusion overhead
    (train-step decomposition, docs/PERF.md).

    The rotated path uses the SORT-FREE exact Green's-theorem formulation
    (``ops.skew_iou_green.skew_iou_green``, r3 — ~3x cheaper than the r2
    rank-sort form): executing the argsort-based ``ops.skew_iou.skew_iou``
    repeatedly inside this scan at 608-px stride-8 grid scale
    (8·76·76·18 ≈ 832k boxes per step) reproducibly CRASHED the TPU worker
    ("kernel fault" — isolated to the scan-around-argsort structure: the
    same evaluation as a single call succeeds, and sort-free forms are
    stable). The mask is stop-gradient anyway.
    """
    pred = decode_boxes_grid(
        jax.lax.stop_gradient(reshape_head(raw, spec).astype(jnp.float32)),
        spec)                                         # (B, H, W, na, 5)

    chunk = 8
    g = gt_boxes.shape[1]
    pad = (-g) % chunk
    gt = jnp.pad(gt_boxes, ((0, 0), (0, pad), (0, 0)))
    # (G_pad/chunk, chunk, B, 5): scan over chunks, vectorize within
    gt_chunks = jnp.swapaxes(gt, 0, 1).reshape(
        (g + pad) // chunk, chunk, gt.shape[0], 5)

    if rotated:
        from ..ops.skew_iou_green import skew_iou_green

        def body(best, gt_c):                         # gt_c: (chunk, B, 5)
            iou = skew_iou_green(
                pred[None], gt_c[:, :, None, None, None, :])
            return jnp.maximum(best, jnp.max(iou, axis=0)), None
    else:
        def body(best, gt_c):
            iou = _aabb_iou(pred[None, ..., :4],
                            gt_c[:, :, None, None, None, :4])
            return jnp.maximum(best, jnp.max(iou, axis=0)), None

    init = jnp.zeros(pred.shape[:-1], jnp.float32)
    best, _ = jax.lax.scan(body, init, gt_chunks)
    return best > spec.ignore_thresh


def compute_loss_head(raw: jnp.ndarray, tgt: HeadTargets, spec: YoloSpec,
                      hyp: Hyp) -> Dict[str, jnp.ndarray]:
    """Loss terms for one head. ``raw`` is the (B, H, W, na*no) head map."""
    p = reshape_head(raw, spec)                  # (B, H, W, na, no)
    b, h, w, na, no = p.shape
    flat = p.reshape(b, h * w * na, no)

    # ---- gather positive-slot predictions (B, G, no) ----------------------
    safe_idx = jnp.maximum(tgt.flat_idx, 0)
    pos = jnp.take_along_axis(flat, safe_idx[..., None], axis=1)
    m = tgt.assigned.astype(p.dtype)             # (B, G)
    n_pos = jnp.maximum(jnp.sum(m), 1.0)

    # xy: sigmoid-offset vs target offset
    pxy = jax.nn.sigmoid(pos[..., 0:2])
    lxy = jnp.sum(_smooth_l1(pxy - tgt.txy) * m[..., None]) / n_pos
    # wh: raw log-ratio regression
    lwh = jnp.sum(_smooth_l1(pos[..., 2:4] - tgt.twh) * m[..., None]) / n_pos
    # angle: bounded tanh offset vs target delta-theta
    pang = ANGLE_RANGE * jnp.tanh(pos[..., 4])
    langle = jnp.sum(_smooth_l1(pang - tgt.tangle) * m) / n_pos

    # skew-IoU regression on decoded positive boxes
    anchors_wh, anchor_angles = head_anchors(spec)
    awh = jnp.asarray(anchors_wh)
    aang = jnp.asarray(anchor_angles)
    a_idx = safe_idx % na                        # anchor of each slot
    cell_flat = safe_idx // na
    gi = (cell_flat % w).astype(p.dtype)
    gj = (cell_flat // w).astype(p.dtype)
    bx = (pxy[..., 0] + gi) * spec.stride
    by = (pxy[..., 1] + gj) * spec.stride
    bwh = awh[a_idx] * jnp.exp(jnp.clip(pos[..., 2:4], -8.0, 8.0))
    bth = aang[a_idx] + pang
    pbox = jnp.stack([bx, by, bwh[..., 0], bwh[..., 1], bth], axis=-1)
    siou = skew_iou(pbox, tgt.tbox_abs)          # (B, G)
    lsiou = jnp.sum((1.0 - siou) * m) / n_pos

    # classification BCE on positive slots
    if spec.num_classes > 1:
        onehot = jax.nn.one_hot(tgt.tcls, spec.num_classes, dtype=p.dtype)
        lcls = jnp.sum(
            _bce_logits(pos[..., 6:], onehot, hyp.cls_pw) * m[..., None]
        ) / n_pos
    else:
        # single-class: cls prob is trained to 1 on positives
        lcls = jnp.sum(
            _bce_logits(pos[..., 6], jnp.ones_like(m), hyp.cls_pw) * m
        ) / n_pos

    # Objectness BCE over the dense grid with the darknet grid-wide ignore
    # region (see objectness_ignore). Positives and negatives are averaged
    # SEPARATELY: a head has O(10^3-10^5) cells and only a handful of
    # positives, so a single grid-mean lets the optimizer drive every obj
    # logit to 0 and still reach near-zero loss (observed: trained nets
    # detected nothing). Per-group means keep the positive term O(1)
    # regardless of grid size.
    obj_logits = p[..., 5]
    bce = _bce_logits(obj_logits, tgt.obj_target, hyp.obj_pw)
    ignore = objectness_ignore(raw, tgt.tbox_abs, spec,
                               rotated=hyp.rotated_ignore).astype(p.dtype)
    pos_mask = tgt.obj_target
    neg_mask = (1.0 - tgt.obj_target) * (1.0 - ignore)
    lobj = _masked_mean(bce, neg_mask) + _masked_mean(bce, pos_mask)

    return {"xy": lxy, "wh": lwh, "angle": langle, "siou": lsiou,
            "cls": lcls, "obj": lobj}


def compute_loss(head_raws: Sequence[jnp.ndarray], targets: jnp.ndarray,
                 valid: jnp.ndarray, yolo_specs: Sequence[YoloSpec],
                 img_size: int, hyp: Hyp = None
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total training loss over all heads.

    Args:
      head_raws: raw head maps from ``apply_network(..., train=True)``.
      targets: (B, MAX_GT, 6) padded GT (cls, cx, cy, w, h, theta),
        xywh normalized; valid: (B, MAX_GT) row mask.
    Returns (total_loss, components) — components are pre-gain means,
    totals are gain-weighted (reference's per-term hyp gains).
    """
    hyp = hyp or Hyp()
    tgts = build_targets(targets, valid, yolo_specs, img_size, hyp.iou_t)
    comp = {k: 0.0 for k in ("xy", "wh", "angle", "siou", "cls", "obj")}
    for raw, tgt, spec in zip(head_raws, tgts, yolo_specs):
        hloss = compute_loss_head(raw, tgt, spec, hyp)
        for k, v in hloss.items():
            comp[k] = comp[k] + v
    nh = float(len(yolo_specs))
    comp = {k: v / nh for k, v in comp.items()}
    total = (hyp.xy * comp["xy"] + hyp.wh * comp["wh"]
             + hyp.angle * comp["angle"] + hyp.siou * comp["siou"]
             + hyp.cls * comp["cls"] + hyp.obj * comp["obj"])
    comp["total"] = total
    return total, comp
