"""Rotated-anchor target assignment, fully vectorized and fixed-shape.

TPU-native rework of the reference's ``utils/utils.py::build_targets``
(SURVEY.md §2 "target assignment"): the reference loops in Python over heads
and ground-truth boxes emitting ragged index lists; here ground truth is
padded to a fixed ``MAX_GT`` slots per image and every head's assignment is
one batched tensor program:

  * anchor fit = wh-IoU(gt, anchor) * |cos(theta_gt - anchor_angle)| —
    the ArIoU-style angle-aware matching the reference layers onto the
    classic darknet wh-IoU (SURVEY.md §2: "best anchors per head by (w,h)
    IoU and angle proximity");
  * each valid GT is assigned to its best-fit anchor at its center cell if
    the fit exceeds ``hyp.iou_t``;
  * outputs are (a) per-GT gather indices + regression targets and (b) a
    dense objectness target grid built with `scatter(drop)` — no ragged
    lists anywhere.

The darknet objectness IGNORE region (predictions whose IoU with any GT
exceeds ``ignore_thresh`` are excluded from the no-object penalty,
grid-wide) depends on the decoded predictions, so it lives in
``train.loss`` (``objectness_ignore``) rather than here — assignment only
sees ground truth.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.darknet import YoloSpec
from ..models.yolo_head import head_anchors
from ..ops.boxes import normalize_angle


class HeadTargets(NamedTuple):
    """Fixed-shape assignment result for one YOLO head."""
    flat_idx: jnp.ndarray    # (B, G) int32 index into H*W*na, -1 if unassigned
    assigned: jnp.ndarray    # (B, G) bool
    txy: jnp.ndarray         # (B, G, 2) cell-offset targets in [0, 1)
    twh: jnp.ndarray         # (B, G, 2) log-size targets vs anchor wh
    tangle: jnp.ndarray      # (B, G) angle offset vs anchor angle (radians)
    tcls: jnp.ndarray        # (B, G) int32 class ids
    tbox_abs: jnp.ndarray    # (B, G, 5) absolute GT rotated box (pixels)
    obj_target: jnp.ndarray  # (B, H, W, na) float 0/1


def _wh_iou(gt_wh: jnp.ndarray, anchor_wh: jnp.ndarray) -> jnp.ndarray:
    """Darknet wh-IoU: overlap of co-centered axis-aligned boxes.

    gt_wh (B, G, 1, 2), anchor_wh (1, 1, na, 2) -> (B, G, na)."""
    inter = (jnp.minimum(gt_wh[..., 0], anchor_wh[..., 0])
             * jnp.minimum(gt_wh[..., 1], anchor_wh[..., 1]))
    union = (gt_wh[..., 0] * gt_wh[..., 1]
             + anchor_wh[..., 0] * anchor_wh[..., 1] - inter)
    return inter / (union + 1e-9)


def build_targets_head(targets: jnp.ndarray, valid: jnp.ndarray,
                       spec: YoloSpec, img_size: int,
                       iou_t: float) -> HeadTargets:
    """Assign padded GT boxes to one head's anchor grid.

    Args:
      targets: (B, G, 6) = (cls, cx, cy, w, h, theta) with cx..h normalized
        to [0, 1] of the net input and theta in radians (the reference's
        label layout, SURVEY.md §2 "dataset / labels").
      valid: (B, G) bool — real (non-padding) GT rows.
      spec: head metadata; img_size: net input size; iou_t: assignment
        threshold from hyp.
    """
    b, g = targets.shape[:2]
    grid = img_size // spec.stride
    anchors_wh, anchor_angles = head_anchors(spec)
    awh = jnp.asarray(anchors_wh)           # (na, 2) pixels
    aang = jnp.asarray(anchor_angles)       # (na,)
    na = spec.na

    cls_id = targets[..., 0].astype(jnp.int32)
    xy = targets[..., 1:3] * img_size       # pixels
    wh = targets[..., 3:5] * img_size
    theta = targets[..., 5]

    # --- anchor fit: wh-IoU x angle proximity -------------------------------
    fit_wh = _wh_iou(wh[:, :, None, :], awh[None, None, :, :])    # (B,G,na)
    dtheta_all = normalize_angle(theta[:, :, None] - aang[None, None, :])
    fit = fit_wh * jnp.abs(jnp.cos(dtheta_all))
    best_a = jnp.argmax(fit, axis=-1)                             # (B,G)
    best_fit = jnp.take_along_axis(fit, best_a[..., None],
                                   axis=-1)[..., 0]
    assigned = valid & (best_fit > iou_t)

    # --- cell + regression targets -----------------------------------------
    cell = jnp.clip((xy / spec.stride).astype(jnp.int32), 0, grid - 1)
    gi, gj = cell[..., 0], cell[..., 1]     # col, row
    txy = xy / spec.stride - cell.astype(xy.dtype)
    anchor_wh_sel = awh[best_a]             # (B, G, 2)
    twh = jnp.log(jnp.maximum(wh, 1e-4) / anchor_wh_sel)
    tangle = normalize_angle(theta - aang[best_a])
    tbox_abs = jnp.concatenate([xy, wh, theta[..., None]], axis=-1)

    size = grid * grid * na
    flat = (gj * grid + gi) * na + best_a
    flat_idx = jnp.where(assigned, flat, -1).astype(jnp.int32)
    # scatter sentinel must be OUT OF BOUNDS (-1 would wrap, numpy-style,
    # and mark the last grid slot positive for every padding row)
    scatter_idx = jnp.where(assigned, flat, size).astype(jnp.int32)

    # --- dense objectness target --------------------------------------------
    # A compare-reduce formulation (fused (B, G, size) equality -> max) was
    # measured IDENTICAL to this scatter in the full train program
    # (docs/PERF.md r3 decomposition) — the scatter is not on the critical
    # path, so the simpler form stays.
    batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, g))
    obj_target = jnp.zeros((b, size), jnp.float32)
    obj_target = obj_target.at[batch_idx, scatter_idx].set(1.0, mode="drop")

    shape4 = (b, grid, grid, na)
    return HeadTargets(
        flat_idx=flat_idx, assigned=assigned, txy=txy, twh=twh,
        tangle=tangle, tcls=cls_id, tbox_abs=tbox_abs,
        obj_target=obj_target.reshape(shape4))


def build_targets(targets: jnp.ndarray, valid: jnp.ndarray,
                  yolo_specs: Sequence[YoloSpec], img_size: int,
                  iou_t: float = 0.2) -> List[HeadTargets]:
    """Per-head assignment for all heads (reference ``build_targets``)."""
    return [build_targets_head(targets, valid, s, img_size, iou_t)
            for s in yolo_specs]
