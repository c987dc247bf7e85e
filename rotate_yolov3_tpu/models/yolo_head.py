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
from typing import List, Sequence, Tuple

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


def decode_all(head_raws: Sequence[jnp.ndarray],
               yolo_specs: Sequence[YoloSpec]) -> jnp.ndarray:
    """Decode + concatenate all heads: eval-mode contract of the reference's
    ``Darknet.forward`` (SURVEY.md §3.4) — (B, N_total, 6+nc)."""
    assert len(head_raws) == len(yolo_specs)
    return jnp.concatenate(
        [decode_head(r, s) for r, s in zip(head_raws, yolo_specs)], axis=1)


def num_predictions(spec: NetworkSpec) -> int:
    """Total decoded prediction count for a square net-input image."""
    n = 0
    for ys in spec.yolo_specs:
        g = spec.img_size // ys.stride
        n += g * g * ys.na
    return n
