"""Rotated YOLO head decode: raw conv maps -> (x, y, w, h, theta, obj, cls).

The core rotation machinery of the reference (SURVEY.md §2 "rotated YOLO
head"): anchors carry angles — each (w, h) anchor is replicated at several
angle offsets — and the head regresses the box angle as an offset from its
anchor's angle. Decode per cell:

    bx = (sigmoid(tx) + cx) * stride
    by = (sigmoid(ty) + cy) * stride
    bw = pw * exp(tw)
    bh = ph * exp(th)
    theta = anchor_angle + ANGLE_RANGE * tanh(t_theta)
    obj, cls = sigmoid

``tanh`` bounds the angle offset to ±ANGLE_RANGE around the anchor angle so
each angle-anchor owns a wedge of orientation space (anchors spaced 30° with
ANGLE_RANGE=30° gives overlapping coverage of the whole circle — the offset
parameterisation BASELINE.json's north_star describes as "angle-offset
anchors").

Everything here is elementwise jnp on fixed shapes — it fuses with the
backbone into a single XLA program (SURVEY.md §3.4: "trivially XLA-fusable").
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .darknet import NetworkSpec, YoloSpec

# Max angle offset a head can regress away from its anchor's angle (radians).
ANGLE_RANGE = math.pi / 6
# exp clamp for w/h regression: keeps early-training decode finite.
_WH_CLAMP = 8.0


def head_anchors(spec: YoloSpec) -> Tuple[np.ndarray, np.ndarray]:
    """Effective anchors of a head: (na, 2) w/h in pixels and (na,) angles.

    Ordering is (wh-major, angle-minor): anchor k = (wh[k // n_ang],
    angles[k % n_ang]). The .weights channel layout follows this same order.
    """
    wh = np.asarray(spec.anchors_wh, np.float32)          # (n_wh, 2)
    ang = np.asarray(spec.anchor_angles, np.float32)      # (n_ang,)
    n_wh, n_ang = len(wh), len(ang)
    anchors_wh = np.repeat(wh, n_ang, axis=0)             # (na, 2)
    anchor_angles = np.tile(ang, n_wh)                    # (na,)
    return anchors_wh, anchor_angles


def reshape_head(raw: jnp.ndarray, spec: YoloSpec) -> jnp.ndarray:
    """(B, H, W, na*no) -> (B, H, W, na, no) training-view of a head map."""
    b, h, w, c = raw.shape
    assert c == spec.na * spec.no, (c, spec.na, spec.no)
    return raw.reshape(b, h, w, spec.na, spec.no)


def decode_head(raw: jnp.ndarray, spec: YoloSpec) -> jnp.ndarray:
    """Decode one head's raw map into boxes: (B, H*W*na, 6+nc).

    Channels: cx, cy, w, h (net-input pixels), theta (radians), obj,
    per-class probabilities. Pure elementwise + iota; fixed shapes.
    """
    p = reshape_head(raw, spec)
    b, h, w = p.shape[:3]
    anchors_wh, anchor_angles = head_anchors(spec)
    awh = jnp.asarray(anchors_wh)                         # (na, 2)
    aang = jnp.asarray(anchor_angles)                     # (na,)

    gy = jax.lax.broadcasted_iota(p.dtype, (h, w), 0)
    gx = jax.lax.broadcasted_iota(p.dtype, (h, w), 1)
    grid = jnp.stack([gx, gy], axis=-1)[None, :, :, None, :]  # (1,H,W,1,2)

    xy = (jax.nn.sigmoid(p[..., 0:2]) + grid) * spec.stride
    wh = awh[None, None, None, :, :] * jnp.exp(
        jnp.clip(p[..., 2:4], -_WH_CLAMP, _WH_CLAMP))
    theta = (aang[None, None, None, :]
             + ANGLE_RANGE * jnp.tanh(p[..., 4]))[..., None]
    obj = jax.nn.sigmoid(p[..., 5:6])
    cls = jax.nn.sigmoid(p[..., 6:])
    out = jnp.concatenate([xy, wh, theta, obj, cls], axis=-1)
    return out.reshape(b, h * w * spec.na, spec.no)


def decode_boxes_grid(p: jnp.ndarray, spec: YoloSpec) -> jnp.ndarray:
    """Decode ONLY the boxes of a head-view map: (B, H, W, na, no) ->
    (B, H, W, na, 5) pixel boxes, keeping the grid layout.

    Used by the training loss to build the darknet objectness-ignore region
    (decoded prediction vs GT IoU over the whole grid)."""
    b, h, w, na, no = p.shape
    anchors_wh, anchor_angles = head_anchors(spec)
    awh = jnp.asarray(anchors_wh)
    aang = jnp.asarray(anchor_angles)
    gy = jax.lax.broadcasted_iota(p.dtype, (h, w), 0)
    gx = jax.lax.broadcasted_iota(p.dtype, (h, w), 1)
    grid = jnp.stack([gx, gy], axis=-1)[None, :, :, None, :]
    xy = (jax.nn.sigmoid(p[..., 0:2]) + grid) * spec.stride
    wh = awh[None, None, None, :, :] * jnp.exp(
        jnp.clip(p[..., 2:4], -_WH_CLAMP, _WH_CLAMP))
    theta = (aang[None, None, None, :]
             + ANGLE_RANGE * jnp.tanh(p[..., 4]))[..., None]
    return jnp.concatenate([xy, wh, theta], axis=-1)


def decode_all(head_raws: Sequence[jnp.ndarray],
               yolo_specs: Sequence[YoloSpec]) -> jnp.ndarray:
    """Decode + concatenate all heads: eval-mode contract of the reference's
    ``Darknet.forward`` (SURVEY.md §3.4) — (B, N_total, 6+nc)."""
    assert len(head_raws) == len(yolo_specs)
    return jnp.concatenate(
        [decode_head(r, s) for r, s in zip(head_raws, yolo_specs)], axis=1)


def head_scores(raw: jnp.ndarray, spec: YoloSpec) -> jnp.ndarray:
    """Detection scores straight from the raw head map: (B, H*W*na).

    score = sigmoid(obj) * max_c sigmoid(cls_c) — computed WITHOUT decoding
    boxes, so the score-first inference path (see
    ``ops.rotated_nms.non_max_suppression_fused``) never materialises the
    full (B, N, 6+nc) decoded tensor.
    """
    p = reshape_head(raw, spec)
    b = p.shape[0]
    obj = jax.nn.sigmoid(p[..., 5])
    if spec.num_classes > 1:
        cls = jnp.max(jax.nn.sigmoid(p[..., 6:]), axis=-1)
    else:
        cls = jax.nn.sigmoid(p[..., 6])
    return (obj * cls).reshape(b, -1)


def decode_gathered(head_raws: Sequence[jnp.ndarray],
                    yolo_specs: Sequence[YoloSpec],
                    idx: jnp.ndarray) -> jnp.ndarray:
    """Decode only the selected predictions.

    Args:
      head_raws: raw per-head maps (B, H, W, na*no).
      idx: (B, K) int32 global flat indices into the concatenated
        per-head flattened prediction axis (same ordering as
        ``decode_all``: heads in order, each H*W*na row-major).
    Returns:
      (B, K, 6+nc) decoded rows — identical values to
      ``decode_all(...)[b, idx]`` but with the decode math running on K
      rows instead of the full prediction tensor.

    One row-gather from the heads' concatenated flat view (not one per
    head — the earlier per-head form gathered 3x the rows and discarded
    2/3 through selects), then per-row head attribution (stride, grid
    cell, anchor) via piecewise masks over the three index segments, and
    a single decode over the K rows.
    """
    b, k = idx.shape
    no = yolo_specs[0].no
    flat_all = jnp.concatenate(
        [reshape_head(r, s).reshape(b, -1, no)
         for r, s in zip(head_raws, yolo_specs)], axis=1)
    rows = jnp.take_along_axis(
        flat_all, idx[..., None], axis=1).astype(jnp.float32)

    zf = jnp.zeros((b, k), jnp.float32)
    stride_v, gx, gy = zf, zf, zf
    aw_v, ah_v, aang_v = zf, zf, zf
    offset = 0
    for raw, spec in zip(head_raws, yolo_specs):
        h, w = raw.shape[1], raw.shape[2]
        n = h * w * spec.na
        local = idx - offset
        in_head = (local >= 0) & (local < n)
        safe = jnp.clip(local, 0, n - 1)
        anchors_wh, anchor_angles = head_anchors(spec)
        awh = jnp.asarray(anchors_wh)
        aang = jnp.asarray(anchor_angles)
        a_idx = safe % spec.na
        cell = safe // spec.na
        stride_v = jnp.where(in_head, float(spec.stride), stride_v)
        gx = jnp.where(in_head, (cell % w).astype(jnp.float32), gx)
        gy = jnp.where(in_head, (cell // w).astype(jnp.float32), gy)
        aw_v = jnp.where(in_head, awh[a_idx][..., 0], aw_v)
        ah_v = jnp.where(in_head, awh[a_idx][..., 1], ah_v)
        aang_v = jnp.where(in_head, aang[a_idx], aang_v)
        offset += n

    xy = (jax.nn.sigmoid(rows[..., 0:2])
          + jnp.stack([gx, gy], axis=-1)) * stride_v[..., None]
    wh = jnp.stack([aw_v, ah_v], axis=-1) * jnp.exp(
        jnp.clip(rows[..., 2:4], -_WH_CLAMP, _WH_CLAMP))
    theta = (aang_v + ANGLE_RANGE * jnp.tanh(rows[..., 4]))[..., None]
    obj = jax.nn.sigmoid(rows[..., 5:6])
    cls = jax.nn.sigmoid(rows[..., 6:])
    return jnp.concatenate([xy, wh, theta, obj, cls], axis=-1)


def num_predictions(spec: NetworkSpec) -> int:
    """Total decoded prediction count for a square net-input image."""
    n = 0
    for ys in spec.yolo_specs:
        g = spec.img_size // ys.stride
        n += g * g * ys.na
    return n
