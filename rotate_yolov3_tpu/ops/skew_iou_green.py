"""Sort-free exact skew-IoU via Green's-theorem edge clipping.

Third (and cheapest) formulation of the exact rotated-rect IoU that the
reference computes with shapely/CUDA polygon clipping (SURVEY.md §2
"skew-IoU"). The candidate-point formulation (``ops.skew_iou`` /
``ops.skew_iou_pallas``) enumerates 24 possible intersection-polygon
vertices and must ORDER them (argsort or rank-sort + 8-slot compaction) —
ordering is ~2/3 of its cost and the compaction has a measure-zero
degenerate drop (see its docstring). This module removes vertex
enumeration entirely:

    area(A ∩ B) = ∮_{∂(A∩B)} (x dy − y dx) / 2

and ∂(A∩B) consists of sub-segments of A's edges inside B plus
sub-segments of B's edges inside A. Each sub-segment is found by
Liang–Barsky parametric clipping against the other rect's 4 half-planes
(two dot products per vertex in the rect's local frame), and its line
integral is ½(x_P·y_Q − x_Q·y_P). Green's theorem does not care in which
ORDER the boundary pieces are summed — so no sort, no compaction, no
atan2, and every op is elementwise (Pallas/Mosaic-friendly and cheap).

Coincident-boundary degeneracy (the one sharp edge): if an edge of A is
collinear with an edge of B (identical boxes, grid-aligned neighbours —
common in detection data), the shared segment lies on BOTH boundaries and
a naive sum counts it twice. Resolved by an asymmetric tolerance: A's
edges clip against B *expanded* by σ (relaxed), B's edges clip against A
*shrunk* by σ (strict). A shared-line segment is then always counted via
A's side and never via B's; whenever such a segment is on the true
boundary, A's clipped piece covers it exactly (both traversal directions
agree because both interiors lie on the same side). σ is relative to the
pair's size scale, ~1e2× above f32 FMA noise, and costs O(σ·perimeter)
area error (~1e-4 relative).

Touching-from-outside boxes (zero-area contact along a line) produce a
single unclosed piece whose lone Green term is NEGATIVE (the reference
center lies right of the traversal), so the final ``max(area, 0)`` clamp
zeroes them exactly.

All coordinates are evaluated relative to B's center (pieces of a closed
curve sum translation-invariantly, but σ-slivers leave near-closure gaps
whose chord error scales with the coordinate magnitude — centering keeps
that at box scale, not image scale).

Differentiable a.e. by plain autodiff — with one sharp caveat: at
EXACTLY-parallel edge pairs (Δθ ≡ 0 mod π/2, e.g. a prediction whose θ
bit-equals its GT's) the parallel axis's reciprocal is ±inf and autodiff
produces NaN through the 0·inf cotangent, the standard ``where``-inf
trap. The forward value is exact there (IEEE inf/NaN propagation falls
into the empty/unconstrained window on its own — see ``_edge_contrib``);
only gradients are affected. The training loss therefore differentiates
through ``ops.skew_iou.skew_iou`` (argsort path, finite subgradients)
and uses this module only under ``stop_gradient`` (objectness-ignore
mask) and in inference NMS. Unlike the argsort path this is also safe
inside ``lax.scan`` on the TPU backend (no sort; see CLAUDE.md rule 8).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8
_SIG_REL = 1e-5

# corner sign pattern, CCW in standard orientation (matches
# skew_iou_pallas._corners / ops.boxes.rbox_corners ordering)
_SIGNS = ((-1, -1), (1, -1), (1, 1), (-1, 1))


def _corner_offsets(w, h, ux, uy):
    """Corner offsets relative to the rect center: lists of 4 x / 4 y.

    offset_k = sx·(w/2)·u + sy·(h/2)·v with u = (ux, uy), v = (−uy, ux).
    """
    hw, hh = w * 0.5, h * 0.5
    xs = [sx * hw * ux - sy * hh * uy for sx, sy in _SIGNS]
    ys = [sx * hw * uy + sy * hh * ux for sx, sy in _SIGNS]
    return xs, ys


def _rect_dists(px, py, ux, uy, hw, hh):
    """Signed distances (positive inside) of point p — given RELATIVE to
    the rect center — to the rect's 4 half-planes, via 2 dot products."""
    s = px * ux + py * uy
    t = -px * uy + py * ux
    return (hw - s, hw + s, hh - t, hh + t)


def _edge_contrib(p0x, p0y, p1x, p1y, d0, recips):
    """Green's line integral of edge p0→p1 clipped to the 4 half-planes.

    d0: 4-tuple of the START point's (σ-shifted) plane distances. The 4
    planes are 2 SLABS (opposite-plane pairs), so clipping is the classic
    slab method: the two crossing parameters of a slab bound its inside
    window as [min(tc⁺, tc⁻), max(tc⁺, tc⁻)] — no entering/leaving sign
    tests, no separate both-outside flag (a miss makes the window empty
    on its own). Only the start point's distances are needed: the end
    point's enter through the shared per-axis reciprocal.

    The clipped sub-segment's integral needs no clipped endpoints: along
    p(t) = p0 + t·e the integrand x·y′ − y·x′ is the CONSTANT p0×e = p0×p1
    (the t-terms cancel), so ∫ = (t_hi−t_lo)·(p0×p1)/2. For B's own edges
    the endpoints are per-box corner offsets, making p0×p1 a per-box
    broadcast rather than per-pair work.

    ``recips=(rs, rt)`` are the per-axis crossing-denominator reciprocals
    1/(s1−s0), 1/(t1−t0); opposite edges of a rect pass the same pair
    negated (e₂ = −e₀ exactly), so 2 divides serve 2 edges — divides are
    the VPU's most expensive ops here (measured in docs/PERF.md). An edge
    parallel to a slab axis makes rs ±inf and its two tcs ±inf: inside
    the slab they land ∓/±inf (window unconstrained), outside both land
    on the same side (window empty) — IEEE propagation gives the right
    answer with no guard. The only NaN source, 0·inf from a parallel edge
    LYING ON a slab boundary, cannot occur for real pairs: the σ shift
    keeps collinear-boundary distances at ±σ ≠ 0, and a NaN anywhere in
    the window collapses ``hi > lo`` to False (contribution 0).
    """
    rs, rt = recips
    tc0 = d0[0] * rs                       # crossing of s = +hw′
    tc1 = -(d0[1] * rs)                    # crossing of s = −hw′
    tc2 = d0[2] * rt
    tc3 = -(d0[3] * rt)
    lo = jnp.maximum(jnp.maximum(jnp.minimum(tc0, tc1),
                                 jnp.minimum(tc2, tc3)), 0.0)
    hi = jnp.minimum(jnp.minimum(jnp.maximum(tc0, tc1),
                                 jnp.maximum(tc2, tc3)), 1.0)
    c = 0.5 * (hi - lo) * (p0x * p1y - p0y * p1x)
    return jnp.where(hi > lo, c, 0.0)


def inter_area_green(acx, acy, aw, ah, ath, bcx, bcy, bw, bh, bth):
    """Exact rect∩rect area, elementwise over broadcastable SoA fields.

    Works identically as plain jnp (any backend) and inside a Pallas tile
    body with (BN, 1) / (1, BM) operands — everything is elementwise with
    static Python loops over the 4+4 edges.
    """
    uax, uay = jnp.cos(ath), jnp.sin(ath)
    ubx, uby = jnp.cos(bth), jnp.sin(bth)
    ahw, ahh = aw * 0.5, ah * 0.5
    bhw, bhh = bw * 0.5, bh * 0.5
    arx, ary = _corner_offsets(aw, ah, uax, uay)   # rel. own center
    brx, bry = _corner_offsets(bw, bh, ubx, uby)
    ox, oy = acx - bcx, acy - bcy                  # A center rel. B center

    sig = _SIG_REL * (0.5 * (aw + ah + bw + bh)
                      + jnp.abs(ox) + jnp.abs(oy))

    # σ folds into the half-dims: d ± σ == dists against a rect expanded/
    # shrunk by σ (same uniform shift on all four planes) — 4 adds per
    # pair instead of 32
    bhw_r, bhh_r = bhw + sig, bhh + sig          # B expanded (relaxed)
    ahw_s, ahh_s = ahw - sig, ahh - sig          # A shrunk (strict)

    # A corners rel. B center, and their (σ-relaxed) distances inside B
    pax = [arx[k] + ox for k in range(4)]
    pay = [ary[k] + oy for k in range(4)]
    da = [_rect_dists(pax[k], pay[k], ubx, uby, bhw_r, bhh_r)
          for k in range(4)]
    # B corners rel. A center, and their (σ-strict) distances inside A
    qax = [brx[k] - ox for k in range(4)]
    qay = [bry[k] - oy for k in range(4)]
    db = [_rect_dists(qax[k], qay[k], uax, uay, ahw_s, ahh_s)
          for k in range(4)]

    # Clip-parameter reciprocals, shared across opposite edges: corner
    # offsets negate exactly under the _SIGNS pattern, so e₂ = −e₀ and
    # e₃ = −e₁ BIT-exactly — edge 2/3 reuse edge 0/1's reciprocals
    # negated. Denominators come from edge-direction dot products
    # (algebraically equal to the σ-cancelling distance differences
    # _edge_contrib would otherwise form): 8 divides per pair, not 16.
    def _recips(e0x, e0y, ux, uy):
        return (1.0 / (e0x * ux + e0y * uy),
                1.0 / (-e0x * uy + e0y * ux))

    ra = [_recips(arx[k + 1] - arx[k], ary[k + 1] - ary[k], ubx, uby)
          for k in (0, 1)]
    ra += [(-ra[0][0], -ra[0][1]), (-ra[1][0], -ra[1][1])]
    rb = [_recips(brx[k + 1] - brx[k], bry[k + 1] - bry[k], uax, uay)
          for k in (0, 1)]
    rb += [(-rb[0][0], -rb[0][1]), (-rb[1][0], -rb[1][1])]

    area = jnp.zeros_like(ox)
    for k in range(4):
        n = (k + 1) % 4
        # A's edge k, coordinates rel. B center, clipped to expanded B
        area = area + _edge_contrib(pax[k], pay[k], pax[n], pay[n],
                                    da[k], ra[k])
        # B's edge k, coordinates rel. B center (its own offsets),
        # clipped to shrunk A
        area = area + _edge_contrib(brx[k], bry[k], brx[n], bry[n],
                                    db[k], rb[k])
    return jnp.maximum(area, 0.0)


def inter_area_green_bframe(acx, acy, aw, ah, ath, bcx, bcy, bw, bh, bth):
    """``inter_area_green`` computed entirely in B's ROTATED frame.

    Same slab-clipped Green decomposition (area and clip windows are
    rotation invariant), but with every coordinate expressed in B's local
    frame the geometry simplifies:
      * B's clip slabs are AXIS-ALIGNED: A-corner distances are plain
        ``bhw′ ∓ S`` (no per-corner dot products);
      * B's corners are the constants (±bhw, ±bhh) and all four of B's
        edge cross products collapse to the per-box constant 2·bhw·bhh;
      * every clip-denominator reciprocal is 1/(2·m) for one of the eight
        half-dim×cosΔ/sinΔ products m — no edge-direction dot products.
    ~15% fewer per-pair VPU ops than ``inter_area_green`` (docs/PERF.md);
    bit-comparable within FP reassociation (pinned in tests).
    """
    uax, uay = jnp.cos(ath), jnp.sin(ath)
    ubx, uby = jnp.cos(bth), jnp.sin(bth)
    ca = uax * ubx + uay * uby                   # cos(θa − θb)
    sa = uay * ubx - uax * uby                   # sin(θa − θb)
    ox, oy = acx - bcx, acy - bcy
    os_ = ox * ubx + oy * uby                    # A center in B frame
    ot = -ox * uby + oy * ubx

    ahw, ahh = aw * 0.5, ah * 0.5
    bhw, bhh = bw * 0.5, bh * 0.5
    sig = _SIG_REL * (0.5 * (aw + ah + bw + bh)
                      + jnp.abs(ox) + jnp.abs(oy))
    bhw_r, bhh_r = bhw + sig, bhh + sig          # B expanded (relaxed)
    ahw_s, ahh_s = ahw - sig, ahh - sig          # A shrunk (strict)

    m1, m2 = ahw * ca, ahh * sa
    m3, m4 = ahw * sa, ahh * ca
    # A corners in B frame: S_k = os ± (m1 ∓ m2), T_k = ot ± (m3 ± m4),
    # signs per _SIGNS ((−1,−1),(1,−1),(1,1),(−1,1))
    p, q = m1 - m2, m1 + m2
    r, w_ = m3 + m4, m3 - m4
    S = [os_ - p, os_ + q, os_ + p, os_ - q]
    T = [ot - r, ot + w_, ot + r, ot - w_]
    da = [(bhw_r - S[k], bhw_r + S[k], bhh_r - T[k], bhh_r + T[k])
          for k in range(4)]
    # A edge directions: e0 = (2m1, 2m3), e1 = (−2m2, 2m4), e2/e3 negated
    ra = [(0.5 / m1, 0.5 / m3), (-0.5 / m2, 0.5 / m4)]
    ra += [(-ra[0][0], -ra[0][1]), (-ra[1][0], -ra[1][1])]

    n1, n2 = bhw * ca, bhh * sa
    n3, n4 = bhw * sa, bhh * ca
    # B corners projected on A's axes, A-centered: u_k = ±n1 ± n2 − cu,
    # v_k = ∓n3 ± n4 − cv
    cu = os_ * ca + ot * sa
    cv = -os_ * sa + ot * ca
    pu, qu = n1 - n2, n1 + n2
    rv, wv = n4 - n3, n4 + n3
    U = [-qu - cu, pu - cu, qu - cu, -pu - cu]
    V = [-rv - cv, -wv - cv, rv - cv, wv - cv]
    db = [(ahw_s - U[k], ahw_s + U[k], ahh_s - V[k], ahh_s + V[k])
          for k in range(4)]
    # B edge directions on A's axes: e0 = (2bhw, 0) → (2n1, −2n3);
    # e1 = (0, 2bhh) → (2n2, 2n4); e2/e3 negated
    rb = [(0.5 / n1, -0.5 / n3), (0.5 / n2, 0.5 / n4)]
    rb += [(-rb[0][0], -rb[0][1]), (-rb[1][0], -rb[1][1])]

    # B's own-edge cross products in B frame: every edge contributes the
    # same p0×p1 = 2·bhw·bhh (axis-aligned CCW square)
    bcross = 2.0 * bhw * bhh

    area = jnp.zeros_like(os_)
    for k in range(4):
        n = (k + 1) % 4
        area = area + _edge_contrib(S[k], T[k], S[n], T[n], da[k], ra[k])
        area = area + _edge_contrib_cross(bcross, db[k], rb[k])
    return jnp.maximum(area, 0.0)


def _edge_contrib_cross(cross, d0, recips):
    """``_edge_contrib`` with the p0×p1 cross product precomputed."""
    rs, rt = recips
    tc0 = d0[0] * rs
    tc1 = -(d0[1] * rs)
    tc2 = d0[2] * rt
    tc3 = -(d0[3] * rt)
    lo = jnp.maximum(jnp.maximum(jnp.minimum(tc0, tc1),
                                 jnp.minimum(tc2, tc3)), 0.0)
    hi = jnp.minimum(jnp.minimum(jnp.maximum(tc0, tc1),
                                 jnp.maximum(tc2, tc3)), 1.0)
    c = 0.5 * (hi - lo) * cross
    return jnp.where(hi > lo, c, 0.0)


def skew_iou_green(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise exact skew-IoU of broadcastable (..., 5) rotated boxes.

    Drop-in for ``ops.skew_iou.skew_iou`` (argsort ordering) and
    ``ops.skew_iou_pallas.skew_iou_elementwise`` (rank-sort + compaction):
    same math, no ordering stage at all. Differentiable a.e.; scan-safe.
    """
    b1, b2 = jnp.broadcast_arrays(b1.astype(jnp.float32),
                                  b2.astype(jnp.float32))
    inter = inter_area_green(
        b1[..., 0], b1[..., 1], b1[..., 2], b1[..., 3], b1[..., 4],
        b2[..., 0], b2[..., 1], b2[..., 2], b2[..., 3], b2[..., 4])
    a1 = b1[..., 2] * b1[..., 3]
    a2 = b2[..., 2] * b2[..., 3]
    inter = jnp.minimum(inter, jnp.minimum(a1, a2))
    return inter / (a1 + a2 - inter + _EPS)


def skew_iou_matrix_green(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise (N, 5) × (M, 5) → (N, M) exact IoU matrix, pure jnp."""
    return skew_iou_green(a[:, None, :], b[None, :, :])
