"""Rotated-box primitives: corner conversion, areas, letterbox rescale.

Box convention throughout the framework: ``(cx, cy, w, h, theta)`` with
``theta`` in **radians**, the counter-clockwise rotation of the box's
``w``-axis from the image x-axis. This matches the reference's
``(x, y, w, h, θ)`` layout (SURVEY.md §0) while fixing radians internally
(cfg ``angles`` fields are degrees and converted at parse-time by the model
builder).

All functions are pure jnp, fixed-shape, and batch over leading dims — they
run identically under jit on TPU and CPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def rbox_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) rotated boxes -> (..., 4, 2) corner points (CCW order).

    Corners are emitted in consistent counter-clockwise order in standard
    math orientation: (-w/2,-h/2), (w/2,-h/2), (w/2,h/2), (-w/2,h/2) rotated
    by theta and translated to the center.
    """
    cx, cy, w, h, th = (boxes[..., i] for i in range(5))
    cos, sin = jnp.cos(th), jnp.sin(th)
    dx = jnp.stack([-w, w, w, -w], axis=-1) * 0.5   # (..., 4)
    dy = jnp.stack([-h, -h, h, h], axis=-1) * 0.5
    x = cx[..., None] + dx * cos[..., None] - dy * sin[..., None]
    y = cy[..., None] + dx * sin[..., None] + dy * cos[..., None]
    return jnp.stack([x, y], axis=-1)               # (..., 4, 2)


def rbox_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) -> (...,) rectangle areas (w*h)."""
    return boxes[..., 2] * boxes[..., 3]


def poly_area(pts: jnp.ndarray) -> jnp.ndarray:
    """Shoelace area of (..., K, 2) closed polygons (vertices in order)."""
    x, y = pts[..., 0], pts[..., 1]
    xn, yn = jnp.roll(x, -1, axis=-1), jnp.roll(y, -1, axis=-1)
    return 0.5 * jnp.abs(jnp.sum(x * yn - xn * y, axis=-1))


def rbox_aabb(boxes: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned bounding box of rotated boxes: (..., 4) = x1,y1,x2,y2.

    Used as a cheap overlap pre-filter before exact skew-IoU.
    """
    c = rbox_corners(boxes)
    mn = jnp.min(c, axis=-2)
    mx = jnp.max(c, axis=-2)
    return jnp.concatenate([mn, mx], axis=-1)


def normalize_angle(theta: jnp.ndarray) -> jnp.ndarray:
    """Wrap angles into [-pi/2, pi/2) exploiting the rect's 180° symmetry."""
    return jnp.mod(theta + jnp.pi / 2, jnp.pi) - jnp.pi / 2


def scale_coords_rotated(boxes: jnp.ndarray, ratio, pad) -> jnp.ndarray:
    """Map rotated boxes from letterboxed coords back to the original image.

    Inverse of ``data.letterbox``: subtract padding, divide by the resize
    ratio. Angles and aspect are preserved (letterbox is isotropic). The
    reference does the same rescale after NMS in detect.py (SURVEY.md §3.2).

    Args:
      boxes: (..., 5+) — first five channels are (cx, cy, w, h, theta);
        any trailing channels (score, class) pass through untouched.
      ratio: scalar resize ratio (new/old).
      pad:   (pad_x, pad_y) letterbox padding in letterboxed pixels.
    """
    pad = jnp.asarray(pad, dtype=boxes.dtype)
    cx = (boxes[..., 0] - pad[0]) / ratio
    cy = (boxes[..., 1] - pad[1]) / ratio
    w = boxes[..., 2] / ratio
    h = boxes[..., 3] / ratio
    out = jnp.stack([cx, cy, w, h, boxes[..., 4]], axis=-1)
    if boxes.shape[-1] > 5:
        out = jnp.concatenate([out, boxes[..., 5:]], axis=-1)
    return out
