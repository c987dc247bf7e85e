"""Exact skew-IoU (rotated-rectangle intersection-over-union) in pure jnp.

TPU-native replacement for the reference's native IoU path — a shapely-based
Python routine plus a CUDA kernel (SURVEY.md §2 "skew-IoU": `utils/utils.py::
skewiou` + `utils/nms/` CUDA). Instead of sequential Sutherland–Hodgman
clipping (a data-dependent loop), we use the fixed-shape candidate-point
formulation that vectorises over box pairs with no dynamic control flow:

  1. the intersection polygon of two convex quads has <= 8 vertices, each of
     which is either (a) an edge-pair intersection point (16 candidates) or
     (b) a vertex of one rect inside the other (8 candidates);
  2. compute all 24 candidates + validity masks with branch-free math;
  3. sort valid candidates CCW by angle around their centroid (the
     intersection of convex sets is convex, so angular order is the hull
     order) and take the masked shoelace area.

Everything is `jnp.where`-selected, so the whole computation is one fused XLA
elementwise program, differentiable almost everywhere — the same function
serves the skew-IoU regression loss (SURVEY.md §2 "loss") and exact
evaluation/NMS. A Pallas kernel specialisation of the same math lives in
``ops/skew_iou_pallas.py`` for the big pairwise-matrix workloads.

Gradients: divisions are double-`where` guarded so invalid candidates (e.g.
parallel edges) produce neither NaN values nor NaN gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import rbox_corners

_EPS = 1e-8
# Tolerance for inclusive inside/on-segment tests; keeps vertex-on-edge
# degeneracies (identical boxes, shared edges) stable.
_TOL = 1e-6


def _cross(ax, ay, bx, by):
    return ax * by - ay * bx


def _pair_intersection_area(c1: jnp.ndarray, c2: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of two convex quads given corners (..., 4, 2).

    Branch-free; broadcasts over leading dims.
    """
    # --- candidate set A: 16 edge-pair intersection points ---------------
    p1 = c1                                   # (..., 4, 2) edge starts
    p2 = jnp.roll(c1, -1, axis=-2)            # edge ends
    q1 = c2
    q2 = jnp.roll(c2, -1, axis=-2)

    # broadcast to (..., 4, 4, ...) pairs: i = edge of c1, j = edge of c2
    p1x, p1y = p1[..., :, None, 0], p1[..., :, None, 1]
    d1x = (p2 - p1)[..., :, None, 0]
    d1y = (p2 - p1)[..., :, None, 1]
    q1x, q1y = q1[..., None, :, 0], q1[..., None, :, 1]
    d2x = (q2 - q1)[..., None, :, 0]
    d2y = (q2 - q1)[..., None, :, 1]

    denom = _cross(d1x, d1y, d2x, d2y)                     # (..., 4, 4)
    denom_ok = jnp.abs(denom) > _EPS
    safe_denom = jnp.where(denom_ok, denom, 1.0)           # double-where guard
    rx, ry = q1x - p1x, q1y - p1y
    t = _cross(rx, ry, d2x, d2y) / safe_denom
    u = _cross(rx, ry, d1x, d1y) / safe_denom
    inter_ok = (denom_ok & (t >= -_TOL) & (t <= 1 + _TOL)
                & (u >= -_TOL) & (u <= 1 + _TOL))
    ix = p1x + t * d1x
    iy = p1y + t * d1y
    # zero-out invalid coords so no garbage propagates (values masked later
    # anyway, but NaN-free keeps gradients clean)
    ix = jnp.where(inter_ok, ix, 0.0)
    iy = jnp.where(inter_ok, iy, 0.0)
    cand_a = jnp.stack([ix, iy], axis=-1).reshape(*ix.shape[:-2], 16, 2)
    mask_a = inter_ok.reshape(*inter_ok.shape[:-2], 16)

    # --- candidate set B: vertices of each quad inside the other ----------
    def _inside(pts, quad):
        """pts (..., 4, 2) inside convex CCW quad (..., 4, 2)?"""
        a = quad                                  # (..., 4, 2)
        b = jnp.roll(quad, -1, axis=-2)
        ex = (b - a)[..., None, :, 0]             # (..., 1, 4)
        ey = (b - a)[..., None, :, 1]
        px = pts[..., :, None, 0] - a[..., None, :, 0]   # (..., 4pts, 4edges)
        py = pts[..., :, None, 1] - a[..., None, :, 1]
        crs = _cross(ex, ey, px, py)
        # scale tolerance by edge length so the test is resolution-robust
        tol = _TOL * jnp.sqrt(ex * ex + ey * ey + _EPS)
        return jnp.all(crs >= -tol, axis=-1)      # CCW: inside = left of all

    in1 = _inside(c1, c2)     # verts of c1 inside c2, (..., 4)
    in2 = _inside(c2, c1)
    cand = jnp.concatenate([cand_a, c1, c2], axis=-2)     # (..., 24, 2)
    mask = jnp.concatenate([mask_a, in1, in2], axis=-1)   # (..., 24)

    # --- convex angular ordering + masked shoelace ------------------------
    maskf = mask.astype(cand.dtype)
    n_valid = jnp.sum(maskf, axis=-1)                     # (...,)
    centroid = (jnp.sum(cand * maskf[..., None], axis=-2)
                / jnp.maximum(n_valid, 1.0)[..., None])
    rel = cand - centroid[..., None, :]
    ang = jnp.arctan2(rel[..., 1], rel[..., 0])
    # push invalid candidates to the end of the sort order
    key = jnp.where(mask, ang, 1e4)
    order = jnp.argsort(key, axis=-1)
    sorted_rel = jnp.take_along_axis(rel, order[..., None], axis=-2)
    sorted_msk = jnp.take_along_axis(maskf, order, axis=-1)

    # shoelace over the first n_valid sorted points, wrapping n_valid-1 -> 0
    idx = jnp.arange(24)
    nv = jnp.maximum(n_valid, 1.0)[..., None]
    nxt = jnp.where(idx + 1 >= nv, 0, idx + 1).astype(jnp.int32)
    nxt_rel = jnp.take_along_axis(sorted_rel, nxt[..., None], axis=-2)
    crs = _cross(sorted_rel[..., 0], sorted_rel[..., 1],
                 nxt_rel[..., 0], nxt_rel[..., 1])
    area = 0.5 * jnp.abs(jnp.sum(crs * sorted_msk, axis=-1))
    # fewer than 3 vertices -> degenerate, zero area
    return jnp.where(n_valid >= 3, area, 0.0)


def rbox_intersection_area(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise intersection area of (..., 5) rotated-box arrays."""
    return _pair_intersection_area(rbox_corners(b1), rbox_corners(b2))


def skew_iou(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise exact IoU of (..., 5) rotated boxes (broadcasting)."""
    b1, b2 = jnp.broadcast_arrays(b1, b2)
    inter = rbox_intersection_area(b1, b2)
    a1 = b1[..., 2] * b1[..., 3]
    a2 = b2[..., 2] * b2[..., 3]
    # Clamp: intersection can never exceed either area. Guards numerical
    # overshoot AND the degenerate zero-area case, where the inside-test's
    # zero-length edges would otherwise falsely admit the other box's
    # corners (a zero-area box is a point: IoU must be 0).
    inter = jnp.minimum(inter, jnp.minimum(a1, a2))
    return inter / (a1 + a2 - inter + _EPS)


def skew_iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise exact IoU matrix: (N, 5) x (M, 5) -> (N, M)."""
    return skew_iou(a[:, None, :], b[None, :, :])


def skew_iou_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """1 - skewIoU regression loss (differentiable a.e.).

    The exact candidate-point IoU above is piecewise-smooth in the box
    parameters (all selects are `where`s over smooth branches), so its
    gradient is well-defined almost everywhere and usable directly as the
    reference's skew-IoU regression loss term (SURVEY.md §2 "loss",
    BASELINE.json north_star).
    """
    return 1.0 - skew_iou(pred, target)


# vmapped single-pair entry point, handy for tests / scalar use
skew_iou_pair = jax.jit(skew_iou)


# ---------------------------------------------------------------------------
# General convex-quad IoU — the candidate-point intersection above makes no
# rectangle assumption, so it doubles as the exact polygon IoU the reference
# gets from its C++/SWIG polyiou library (SURVEY.md §2 "polyiou (devkit)").
# DOTA ground truth is arbitrary quadrilaterals; these entry points give the
# evaluation/merge path exact quad-IoU without a separate native lib.
# ---------------------------------------------------------------------------

def quad_area(quads: jnp.ndarray) -> jnp.ndarray:
    """Shoelace area of (..., 4, 2) quads (vertices in order)."""
    x, y = quads[..., 0], quads[..., 1]
    xn = jnp.roll(x, -1, axis=-1)
    yn = jnp.roll(y, -1, axis=-1)
    return 0.5 * jnp.abs(jnp.sum(x * yn - xn * y, axis=-1))


def _ccw_quads(quads: jnp.ndarray) -> jnp.ndarray:
    """Reorder each quad CCW (the inside-tests assume CCW winding)."""
    x, y = quads[..., 0], quads[..., 1]
    signed = 0.5 * jnp.sum(x * jnp.roll(y, -1, axis=-1)
                           - jnp.roll(x, -1, axis=-1) * y, axis=-1)
    flipped = jnp.flip(quads, axis=-2)
    return jnp.where((signed >= 0)[..., None, None], quads, flipped)


def quad_iou(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise exact IoU of (..., 4, 2) convex quads (broadcasting)."""
    q1 = _ccw_quads(jnp.asarray(q1, jnp.float32))
    q2 = _ccw_quads(jnp.asarray(q2, jnp.float32))
    q1, q2 = jnp.broadcast_arrays(q1, q2)
    inter = _pair_intersection_area(q1, q2)
    a1 = quad_area(q1)
    a2 = quad_area(q2)
    inter = jnp.minimum(inter, jnp.minimum(a1, a2))
    return inter / (a1 + a2 - inter + _EPS)


def quad_iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise exact quad IoU: (N, 4, 2) x (M, 4, 2) -> (N, M)."""
    return quad_iou(a[:, None], b[None, :])
