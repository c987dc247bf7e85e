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


def field_major_perm(spec: YoloSpec) -> np.ndarray:
    """Head-conv output-channel permutation: anchor-major -> field-major.

    Canonical darknet channel order is anchor-major (``a*no + f``); the
    score pass then reads the obj/cls fields of every anchor as stride-no
    slices over the LANE dimension of the head map — which XLA must
    relayout (measured cost in docs/PERF.md). Permuting the head conv's
    output channels to field-major (``f*na + a``) makes obj/cls contiguous
    lane slices. ``perm[f*na + a] = a*no + f`` — apply as
    ``kernel[..., perm]`` / ``bias[perm]``; pure reorder, bit-identical
    outputs through the matching ``field_major=True`` decode/score paths.
    """
    na, no = spec.na, spec.no
    perm = np.empty(na * no, np.int64)
    for f in range(no):
        for a in range(na):
            perm[f * na + a] = a * no + f
    return perm


def head_scores(raw: jnp.ndarray, spec: YoloSpec,
                field_major: bool = False) -> jnp.ndarray:
    """Detection scores straight from the raw head map: (B, H*W*na).

    score = sigmoid(obj) * max_c sigmoid(cls_c) — computed WITHOUT decoding
    boxes, so the score-first inference path (see
    ``ops.rotated_nms.non_max_suppression_fused``) never materialises the
    full (B, N, 6+nc) decoded tensor. ``field_major`` selects the
    permuted-head-channel layout (see ``field_major_perm``); candidate
    ordering (cell-major, anchor-minor) is identical either way.
    """
    b = raw.shape[0]
    if field_major:
        # field f owns the CONTIGUOUS lane range [f*na, (f+1)*na) — static
        # lane slices, no (no, na) lane-splitting reshape (which re-tiles
        # to a narrow minor dim; measured cost in docs/PERF.md)
        na = spec.na
        obj = jax.nn.sigmoid(raw[..., 5 * na:6 * na])
        if spec.num_classes > 1:
            # max of logits == argmax of sigmoids (monotonic)
            m = raw[..., 6 * na:7 * na]
            for c in range(1, spec.num_classes):
                m = jnp.maximum(m, raw[..., (6 + c) * na:(7 + c) * na])
            cls = jax.nn.sigmoid(m)
        else:
            cls = jax.nn.sigmoid(raw[..., 6 * na:7 * na])
        return (obj * cls).reshape(b, -1)
    p = reshape_head(raw, spec)
    obj = jax.nn.sigmoid(p[..., 5])
    if spec.num_classes > 1:
        cls = jnp.max(jax.nn.sigmoid(p[..., 6:]), axis=-1)
    else:
        cls = jax.nn.sigmoid(p[..., 6])
    return (obj * cls).reshape(b, -1)


def decode_gathered(head_raws: Sequence[jnp.ndarray],
                    yolo_specs: Sequence[YoloSpec],
                    idx: jnp.ndarray,
                    field_major: bool = False) -> jnp.ndarray:
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

    Gathers run at CELL granularity: each head map's native
    (B, H*W, na*no) layout is a free dim-collapse of the conv output (the
    na*no minor dim is already the lane dim) and the gather pulls whole
    cell rows; the anchor is then selected with an exact one-hot
    contraction. A flat (B, N, no) gather operand was measured +31 us/img
    on TPU — it forces a 7-wide minor dim, lane-padded to 128, an ~18x
    memory blow-up. Measured variants in docs/PERF.md.

    When every head shares the same ``na`` (true for all darknet yolov3
    cfgs) the heads' cell rows are CONCATENATED into one (B, C_total,
    na*no) operand and gathered ONCE: the global candidate ordering is
    heads-in-order / cell-major / anchor-minor, so ``idx // na`` is
    directly the global cell row and ``idx % na`` the anchor — no
    per-head index clipping (which gathers K rows per head, 2/3 of them
    discarded) and no per-head select chains. Grid/stride metadata comes
    from a host-precomputed per-cell table gathered by the same indices.
    """
    nas = {s.na for s in yolo_specs}
    if len(nas) == 1 and len(head_raws) > 1:
        return _decode_gathered_concat(head_raws, yolo_specs, idx,
                                       field_major)
    return _decode_gathered_perhead(head_raws, yolo_specs, idx, field_major)


def _decode_gathered_concat(head_raws, yolo_specs, idx, field_major):
    """Uniform-na fast path of ``decode_gathered`` — see its docstring.

    One row gather; every piece of metadata (grid cell, stride, anchor
    w/h/angle) is ARITHMETIC on the (B, K) index arrays — per-head
    membership selects plus an anchor one-hot contraction — because
    per-candidate metadata gathers would re-introduce the gather cost the
    concat removes.
    """
    b, k = idx.shape
    no = yolo_specs[0].no
    na = yolo_specs[0].na

    cells_all = jnp.concatenate(
        [r.reshape(r.shape[0], -1, na * no) for r in head_raws], axis=1)
    cell_g = idx // na
    a_idx = idx % na

    # row fetch: Pallas aligned-block gather on TPU (XLA's generic gather
    # costs ~28 cycles/row — measured variants in docs/PERF.md), exact
    # jnp.take_along_axis elsewhere; identical values either way
    from ..ops import gather_rows
    r_cells = gather_rows.gather_rows_auto(cells_all, cell_g)
    # anchor selection as a LANE mask + static selection-matrix matmul:
    # reshaping (b, k, na*no) to split the lane dim re-tiles to a
    # narrow (≤8-wide) minor dim, measured +3 us/img over this form at
    # K=512 (docs/PERF.md); the mask is elementwise on the full lane dim
    # and the (na*no, no) matmul sums each field's na lanes on the MXU.
    lanes = jnp.arange(na * no, dtype=jnp.int32)
    lane_a = lanes % na if field_major else lanes // no
    lane_f = lanes // na if field_major else lanes % no
    sel = jnp.asarray(
        (lane_f[:, None] == jnp.arange(no)[None, :]), r_cells.dtype)
    mask = (lane_a[None, None, :] == a_idx[..., None]).astype(r_cells.dtype)
    rows = jax.lax.dot_general(r_cells * mask, sel,
                               (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    onehot_b = a_idx[..., None] == jnp.arange(na)[None, None, :]  # (b,k,na)

    zf = jnp.zeros((b, k), jnp.float32)
    stride_v, gx, gy = zf, zf, zf
    aw_v, ah_v, aang_v = zf, zf, zf
    oh = onehot_b.astype(jnp.float32)
    off = 0
    for raw, s in zip(head_raws, yolo_specs):
        h, w = raw.shape[1], raw.shape[2]
        local = cell_g - off
        in_h = (local >= 0) & (local < h * w)
        stride_v = jnp.where(in_h, float(s.stride), stride_v)
        gx = jnp.where(in_h, (local % w).astype(jnp.float32), gx)
        gy = jnp.where(in_h, (local // w).astype(jnp.float32), gy)
        awh_h, aang_h = head_anchors(s)
        in_f = in_h.astype(jnp.float32)
        aw_v = aw_v + in_f * jnp.sum(oh * jnp.asarray(awh_h[:, 0]), -1)
        ah_v = ah_v + in_f * jnp.sum(oh * jnp.asarray(awh_h[:, 1]), -1)
        aang_v = aang_v + in_f * jnp.sum(oh * jnp.asarray(aang_h), -1)
        off += h * w
    return _decode_rows(rows, stride_v, gx, gy, aw_v, ah_v, aang_v)


def _decode_gathered_perhead(head_raws, yolo_specs, idx, field_major):
    """General path of ``decode_gathered`` (heads may differ in na)."""
    b, k = idx.shape
    no = yolo_specs[0].no

    zf = jnp.zeros((b, k), jnp.float32)
    stride_v, gx, gy = zf, zf, zf
    aw_v, ah_v, aang_v = zf, zf, zf
    rows = jnp.zeros((b, k, no), jnp.float32)
    offset = 0
    for raw, spec in zip(head_raws, yolo_specs):
        h, w = raw.shape[1], raw.shape[2]
        n = h * w * spec.na
        na = spec.na
        local = idx - offset
        in_head = (local >= 0) & (local < n)
        safe = jnp.clip(local, 0, n - 1)
        anchors_wh, anchor_angles = head_anchors(spec)
        awh = jnp.asarray(anchors_wh)
        aang = jnp.asarray(anchor_angles)
        a_idx = safe % na
        cell = safe // na
        cells_view = raw.reshape(b, h * w, na * no)
        if field_major:
            # channel layout f*na + a: gather the (1, na) field slices of
            # the cell and contract with the anchor one-hot (minor-axis
            # reduce — na contiguous lanes, no 7-wide reshape anywhere)
            r_cells = jnp.take_along_axis(cells_view, cell[..., None],
                                          axis=1)     # (b, k, no*na)
            grouped = r_cells.reshape(b, k, no, na)
            onehot = (a_idx[..., None]
                      == jnp.arange(na)[None, None, :]).astype(grouped.dtype)
            picked = jnp.sum(grouped * onehot[:, :, None, :], axis=-1)
        else:
            # anchor-major layout a*no + f: the anchor's no channels are
            # contiguous — gather them directly as a (1, no) lane slice at
            # offset a*no (two-coordinate gather, no select pass)
            starts = jnp.stack([cell, a_idx * no], axis=-1)  # (b, k, 2)
            dnums = jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0, 1))
            picked = jax.vmap(
                lambda op, st: jax.lax.gather(
                    op, st, dnums, slice_sizes=(1, no),
                    mode=jax.lax.GatherScatterMode.CLIP)
            )(cells_view, starts)                     # (b, k, no)
        rows = jnp.where(in_head[..., None], picked.astype(jnp.float32),
                         rows)
        stride_v = jnp.where(in_head, float(spec.stride), stride_v)
        gx = jnp.where(in_head, (cell % w).astype(jnp.float32), gx)
        gy = jnp.where(in_head, (cell // w).astype(jnp.float32), gy)
        aw_v = jnp.where(in_head, awh[a_idx][..., 0], aw_v)
        ah_v = jnp.where(in_head, awh[a_idx][..., 1], ah_v)
        aang_v = jnp.where(in_head, aang[a_idx], aang_v)
        offset += n

    return _decode_rows(rows, stride_v, gx, gy, aw_v, ah_v, aang_v)


def _decode_rows(rows, stride_v, gx, gy, aw_v, ah_v, aang_v):
    """Shared decode math of the gathered paths: (B, K, no) raw rows +
    per-row grid/anchor metadata -> (B, K, 6+nc) decoded rows."""
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
