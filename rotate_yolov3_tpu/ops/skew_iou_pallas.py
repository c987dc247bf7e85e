"""Pallas TPU kernel for the pairwise skew-IoU matrix.

The NMS hot path builds a (K, K) exact rotated-IoU matrix (SURVEY.md §2:
the reference uses an RRPN-lineage CUDA kernel here). This kernel computes
the same candidate-point formulation as ``ops.skew_iou`` but tiled into
VMEM: each grid step loads a (5, BN) column-block of boxes A and a (5, BM)
block of boxes B (structure-of-arrays layout so the lane dimension is the
box index, which tiles to 128), and produces a (BN, BM) IoU tile without
touching HBM for any intermediate.

Differences from the jnp path, forced by what Mosaic lowers well:
  * convex ordering is a rank-sort — 24x24 pairwise angle comparisons and a
    one-hot contraction gather — instead of ``argsort`` (no sort lowering
    in Mosaic, and rank-sort is branch-free VPU work anyway);
  * candidates are stacked on a leading (untiled) axis of shape 24, so every
    op is elementwise over the (BN, BM) tile.

``skew_iou_matrix_pallas`` pads inputs to block multiples with zero boxes;
zero-area padding yields IoU 0 by the same min-area clamp as the jnp path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-8
_TOL = 1e-6
_NCAND = 24


def _corners(cx, cy, w, h, th):
    """Corner coordinate lists (len 4) for a structure-of-arrays box tile."""
    cos, sin = jnp.cos(th), jnp.sin(th)
    xs, ys = [], []
    for sx, sy in ((-1, -1), (1, -1), (1, 1), (-1, 1)):
        dx = sx * w * 0.5
        dy = sy * h * 0.5
        xs.append(cx + dx * cos - dy * sin)
        ys.append(cy + dx * sin + dy * cos)
    return xs, ys


def _candidates(ax, ay, bx, by):
    """All 24 intersection-polygon vertex candidates for a tile pair.

    ax/ay: lists of 4 corner arrays shaped (BN, 1); bx/by: (1, BM).
    Returns (px, py, valid) stacked on a leading 24-axis.
    """
    px, py, valid = [], [], []

    # 16 edge-pair intersections
    for i in range(4):
        p1x, p1y = ax[i], ay[i]
        d1x = ax[(i + 1) % 4] - p1x
        d1y = ay[(i + 1) % 4] - p1y
        for j in range(4):
            q1x, q1y = bx[j], by[j]
            d2x = bx[(j + 1) % 4] - q1x
            d2y = by[(j + 1) % 4] - q1y
            denom = d1x * d2y - d1y * d2x
            # RELATIVE parallelism test: with fused multiply-add the cross
            # product of exactly-parallel edges evaluates to ~ulp(|d1||d2|)
            # instead of 0, which would mint spurious on-segment candidates
            # (they crowd true vertices out of the 8 compaction slots). The
            # relative threshold only discards intersections of edges within
            # ~1e-5 rad of parallel — whose vertex locations f32 cannot
            # condition anyway.
            scale = (jnp.abs(d1x) + jnp.abs(d1y)) \
                * (jnp.abs(d2x) + jnp.abs(d2y))
            ok = jnp.abs(denom) > 1e-5 * scale + _EPS
            sd = jnp.where(ok, denom, 1.0)
            rx, ry = q1x - p1x, q1y - p1y
            t = (rx * d2y - ry * d2x) / sd
            u = (rx * d1y - ry * d1x) / sd
            v = ok & (t >= -_TOL) & (t <= 1 + _TOL) \
                   & (u >= -_TOL) & (u <= 1 + _TOL)
            px.append(jnp.where(v, p1x + t * d1x, 0.0))
            py.append(jnp.where(v, p1y + t * d1y, 0.0))
            valid.append(v)

    # vertices of A inside B, and of B inside A
    def _inside(qx, qy, cx_, cy_):
        """Is point (qx, qy) inside the CCW quad given by corner lists?"""
        res = None
        for j in range(4):
            ex = cx_[(j + 1) % 4] - cx_[j]
            ey = cy_[(j + 1) % 4] - cy_[j]
            crs = ex * (qy - cy_[j]) - ey * (qx - cx_[j])
            tol = _TOL * jnp.sqrt(ex * ex + ey * ey + _EPS)
            ok = crs >= -tol
            res = ok if res is None else (res & ok)
        return res

    for i in range(4):
        v = _inside(ax[i], ay[i], bx, by)
        px.append(jnp.where(v, ax[i] + 0.0 * bx[0], 0.0))
        py.append(jnp.where(v, ay[i] + 0.0 * by[0], 0.0))
        valid.append(v)
    for j in range(4):
        v = _inside(bx[j], by[j], ax, ay)
        px.append(jnp.where(v, bx[j] + 0.0 * ax[0], 0.0))
        py.append(jnp.where(v, by[j] + 0.0 * ay[0], 0.0))
        valid.append(v)

    return (jnp.stack(px, 0), jnp.stack(py, 0),
            jnp.stack(valid, 0))


def _diamond_angle(y, x):
    """Branch-free monotonic surrogate for atan2 (range [0, 4)).

    Mosaic has no atan2 lowering; angular ORDER is all the rank-sort needs,
    and the diamond angle (piecewise rational on L1-normalised coords) has
    exactly atan2's ordering around the circle.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    denom = ax + ay
    safe = jnp.where(denom > _EPS, denom, 1.0)
    t = y / safe
    # quadrant offsets: q1 -> t, q2 -> 2 - t ... mapped via sign tests
    pos_y = jnp.where(x >= 0, t, 2.0 - t)            # y >= 0: [0, 2)
    neg_y = jnp.where(x < 0, 2.0 - t, 4.0 + t)       # y <  0: [2, 4)
    ang = jnp.where(y >= 0, pos_y, neg_y)
    return jnp.where(denom > _EPS, ang, 0.0)


_NSLOT = 8   # convex quad ∩ quad has ≤ 8 vertices (m+n bound)


def _area_from_candidates(px, py, valid):
    """Masked convex-polygon area from unordered candidates.

    px/py/valid: (24, ...) stacked candidates. COMPACTS the valid
    candidates into 8 dense slots (a convex quad∩quad polygon has at most
    m+n = 8 vertices), then rank-sorts the 8 slots by angle around the
    valid-centroid (branch-free pairwise comparisons + one-hot gather) and
    runs a masked shoelace with modular wrap.

    Compaction first is the kernel's big win: the rank-sort + gather over
    all 24 candidate slots was 63% of kernel time (measured ablation,
    docs/PERF.md); over 8 slots it is 24²/8² = 9× less comparison/select
    work for a 24-add running-prefix + 8×24 one-hot contraction.

    Candidates beyond the 8th valid slot are dropped. More than 8 valid
    candidates requires duplicate hits (a vertex of one rect within the
    1e-6 intersection tolerance of the other's edge — true distinct
    vertices are ≤ 8 by the convexity bound). The list order (edge-edge
    intersections first) keeps the true vertices in the common degenerate
    configurations — e.g. near-identical boxes, whose 8 edge-edge hull
    vertices head the list with the tol-inside corner duplicates behind
    them. This is NOT airtight for every measure-zero configuration: a
    corner of A touching B's edge (within tol) while the intersection has
    8 distinct vertices including B-corners deep inside A can fill the 8
    slots with edge-edge duplicates of the touching vertex and drop a true
    B-corner — a geometry-dependent underestimate. Such configurations
    need an exact tol-coincidence between independent rotated boxes
    (measure-zero under any continuous distribution; never observed in
    randomized cross-checks vs the oracle). tests/test_pallas.py pins the
    constructed corner-touch case at its current (small) error so a future
    change that widens the gap is caught.

    Implementation detail: the prefix/rank/gather stages are STATIC Python
    loops rather than broadcast tensor ops — broadcast temporaries of
    tile-sized planes blow VMEM and force Mosaic to spill; the unrolled
    form keeps every temporary one (BN, BM) tile.
    """
    maskf = valid.astype(px.dtype)
    n_valid = jnp.sum(maskf, axis=0)
    inv_n = 1.0 / jnp.maximum(n_valid, 1.0)
    cx = jnp.sum(px * maskf, axis=0) * inv_n
    cy = jnp.sum(py * maskf, axis=0) * inv_n

    zero = jnp.zeros_like(px[0])
    one = jnp.ones_like(px[0])

    # dense position of each valid candidate: running count of valid before
    pos = []
    run = zero
    for i in range(_NCAND):
        pos.append(run)
        run = run + maskf[i]

    # compact centered coordinates into the 8 slots (one-hot contraction)
    crx, cry = [], []
    for s in range(_NSLOT):
        sx = zero
        sy = zero
        for i in range(_NCAND):
            hit = valid[i] & (pos[i] == float(s))
            sx = sx + jnp.where(hit, px[i] - cx, zero)
            sy = sy + jnp.where(hit, py[i] - cy, zero)
        crx.append(sx)
        cry.append(sy)
    n_eff = jnp.minimum(n_valid, float(_NSLOT))

    # epsilon-index offset makes keys unique, so the rank-sort needs no tie
    # logic. Exact-angle ties between DISTINCT valid points would require
    # two hull vertices collinear with the interior centroid — impossible
    # for a convex polygon with positive area; duplicate points are
    # order-independent (they contribute zero to the shoelace either way).
    keys = [jnp.where(float(s) < n_eff,
                      _diamond_angle(cry[s], crx[s]), 1e4)
            + s * 1e-6 for s in range(_NSLOT)]

    # rank[s] = #{t : key[t] < key[s]}
    ranks = []
    for s in range(_NSLOT):
        r = zero
        for t in range(_NSLOT):
            if t != s:
                r = r + jnp.where(keys[t] < keys[s], one, zero)
        ranks.append(r)

    # sorted[r] = sum_s (rank[s] == r) * val[s]
    srx, sry = [], []
    for r in range(_NSLOT):
        ax = zero
        ay = zero
        for s in range(_NSLOT):
            hit = ranks[s] == float(r)
            ax = ax + jnp.where(hit, crx[s], zero)
            ay = ay + jnp.where(hit, cry[s], zero)
        srx.append(ax)
        sry.append(ay)

    # shoelace over the first n_eff sorted slots, wrapping back to slot 0
    area2 = zero
    for r in range(_NSLOT):
        in_poly = (float(r) < n_eff)
        wrap = (float(r) + 1.0) >= n_eff
        nx = jnp.where(wrap, srx[0], srx[(r + 1) % _NSLOT])
        ny = jnp.where(wrap, sry[0], sry[(r + 1) % _NSLOT])
        crs = srx[r] * ny - sry[r] * nx
        area2 = area2 + jnp.where(in_poly, crs, zero)
    area = 0.5 * jnp.abs(area2)
    return jnp.where(n_valid >= 3.0, area, 0.0)


def _iou_tile_kernel(a_ref, b_ref, out_ref, *, block_n=None, block_m=None,
                     triangle=False, algo="green"):
    """One (BN, BM) IoU tile.

    a_ref: (BN, 8) array-of-structures block (fields cx,cy,w,h,th,pad) —
    AoS so its lane dim (8) equals the full array dim, satisfying Mosaic's
    block-shape rule for small BN. b_ref: (8, BM) structure-of-arrays so
    the box index rides the 128-lane dimension.

    ``triangle=True`` computes only tiles that intersect the strict upper
    triangle (col > row) and zero-fills the rest. Greedy NMS consumes
    IoU[i, j] only for j > i (rows are score-descending and a box is never
    suppressed by a lower-ranked one), so whole at-or-below-diagonal tiles
    are dead work — 37.5% of the grid at K=512 with (32, 128) blocks.
    """
    if triangle:
        i = pl.program_id(0)
        j = pl.program_id(1)
        # tile needed iff its max column index exceeds its min row index
        needed = (j * block_m + block_m - 1) > (i * block_n)

        @pl.when(jnp.logical_not(needed))
        def _zero():
            out_ref[:, :] = jnp.zeros_like(out_ref)

        @pl.when(needed)
        def _compute():
            _iou_tile_body(a_ref, b_ref, out_ref, algo)
    else:
        _iou_tile_body(a_ref, b_ref, out_ref, algo)


def _inter_areas_tile(a_ref, b_ref, algo="green"):
    """(BN, BM) clamped intersection area + per-side box areas."""
    acx = a_ref[:, 0][:, None]
    acy = a_ref[:, 1][:, None]
    aw = a_ref[:, 2][:, None]
    ah = a_ref[:, 3][:, None]
    ath = a_ref[:, 4][:, None]
    bcx = b_ref[0, :][None, :]
    bcy = b_ref[1, :][None, :]
    bw = b_ref[2, :][None, :]
    bh = b_ref[3, :][None, :]
    bth = b_ref[4, :][None, :]

    if algo in ("green", "green2"):
        # Green's-theorem edge-clipping formulation: no candidate
        # enumeration, no compaction, no rank-sort — ~3x fewer VPU ops per
        # pair than the candidate path (see ops.skew_iou_green).
        # "green2" = the same math in B's rotated frame (axis-aligned B
        # slabs, constant B crosses — ~15% fewer ops again).
        from .skew_iou_green import inter_area_green, inter_area_green_bframe

        fn = inter_area_green_bframe if algo == "green2" else inter_area_green
        inter = fn(acx, acy, aw, ah, ath, bcx, bcy, bw, bh, bth)
    else:
        ax, ay = _corners(acx, acy, aw, ah, ath)
        bx, by = _corners(bcx, bcy, bw, bh, bth)
        px, py, valid = _candidates(ax, ay, bx, by)
        inter = _area_from_candidates(px, py, valid)

    area_a = aw * ah
    area_b = bw * bh
    inter = jnp.minimum(inter, jnp.minimum(area_a, area_b))
    return inter, area_a, area_b


def _iou_tile_value(a_ref, b_ref, algo="green"):
    """The (BN, BM) IoU tile as a value (shared by both kernel bodies)."""
    inter, area_a, area_b = _inter_areas_tile(a_ref, b_ref, algo)
    return inter / (area_a + area_b - inter + _EPS)


def _iou_tile_body(a_ref, b_ref, out_ref, algo="green"):
    out_ref[:, :] = _iou_tile_value(a_ref, b_ref, algo)


def _prepare_soa(boxes: jnp.ndarray, pad_to: int) -> jnp.ndarray:
    """(N, 5) -> (8, N_pad) structure-of-arrays, zero-padded."""
    n = boxes.shape[0]
    n_pad = -(-n // pad_to) * pad_to
    soa = jnp.zeros((8, n_pad), jnp.float32)
    return jax.lax.dynamic_update_slice(
        soa, boxes.astype(jnp.float32).T, (0, 0))


def _prepare_aos(boxes: jnp.ndarray, pad_to: int) -> jnp.ndarray:
    """(N, 5) -> (N_pad, 8) array-of-structures, zero-padded."""
    n = boxes.shape[0]
    n_pad = -(-n // pad_to) * pad_to
    aos = jnp.zeros((n_pad, 8), jnp.float32)
    return jax.lax.dynamic_update_slice(
        aos, boxes.astype(jnp.float32), (0, 0))


@functools.partial(jax.jit, static_argnames=("block_n", "block_m",
                                             "interpret", "triangle",
                                             "algo"))
def skew_iou_matrix_pallas(a: jnp.ndarray, b: jnp.ndarray,
                           block_n: int = 64, block_m: int = 128,
                           interpret: bool = False,
                           triangle: bool = False,
                           algo: str = "green") -> jnp.ndarray:
    """Exact pairwise skew-IoU matrix (N, 5) x (M, 5) -> (N, M) on TPU.

    Drop-in for ``ops.skew_iou.skew_iou_matrix`` (pass via the
    ``iou_matrix_fn`` hook of ``non_max_suppression``). ``interpret=True``
    runs the same kernel through the Pallas interpreter for CPU tests.
    ``triangle=True`` zero-fills tiles entirely at/below the diagonal
    (valid whenever the consumer only reads col > row, as greedy NMS does).
    ``algo`` selects the per-pair formulation: "green" (Green's-theorem
    edge clipping, default — ~3x fewer VPU ops per pair; measured numbers
    in docs/PERF.md) or "candidates" (the 24-candidate + rank-sort
    formulation, kept as an independent cross-check).
    """
    n, m = a.shape[0], b.shape[0]
    a_aos = _prepare_aos(a, block_n)
    b_soa = _prepare_soa(b, block_m)
    n_pad, m_pad = a_aos.shape[0], b_soa.shape[1]

    grid = (n_pad // block_n, m_pad // block_m)
    out = pl.pallas_call(
        functools.partial(_iou_tile_kernel, block_n=block_n,
                          block_m=block_m, triangle=triangle, algo=algo),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_m), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, block_m), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a_aos, b_soa)
    return out[:n, :m]


def skew_iou_matrix_auto(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pallas kernel on TPU, pure-jnp fallback elsewhere."""
    from .skew_iou import skew_iou_matrix

    platform = jax.default_backend()
    if platform == "tpu":
        return skew_iou_matrix_pallas(a, b)
    return skew_iou_matrix(a, b)


def skew_iou_elementwise(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Exact elementwise skew-IoU via the kernel's sort-free formulation.

    Same math as ``ops.skew_iou.skew_iou`` but ordered by the 8-slot
    compaction + rank-sort of this module instead of ``jnp.argsort`` +
    ``arctan2`` — plain jnp, usable on any backend. Built for the
    training objectness-ignore pass: executing the argsort-based IoU
    repeatedly inside a ``lax.scan`` at (B,H,W,na) grid scale reproducibly
    CRASHES this TPU backend's worker (isolated in train/loss.py's
    docstring), while this sort-free form is stable. Not differentiable
    (hard selects); the loss's regression term keeps the argsort path.
    """
    b1, b2 = jnp.broadcast_arrays(b1.astype(jnp.float32),
                                  b2.astype(jnp.float32))
    ax, ay = _corners(b1[..., 0], b1[..., 1], b1[..., 2], b1[..., 3],
                      b1[..., 4])
    bx, by = _corners(b2[..., 0], b2[..., 1], b2[..., 2], b2[..., 3],
                      b2[..., 4])
    px, py, valid = _candidates(ax, ay, bx, by)
    inter = _area_from_candidates(px, py, valid)
    a1 = b1[..., 2] * b1[..., 3]
    a2 = b2[..., 2] * b2[..., 3]
    inter = jnp.minimum(inter, jnp.minimum(a1, a2))
    return inter / (a1 + a2 - inter + _EPS)


def _kill_tile_kernel(a_ref, b_ref, out_ref, *, block_n, block_m,
                      iou_thr, use_cls, algo):
    """One (BN, BM) tile of the greedy-NMS kill mask (int8).

    kill[i, j] = (j > i) & (cls_i == cls_j) & (IoU > thr). Fusing the
    threshold/triangle/class masks into the kernel shrinks the NMS
    intermediate from a (K, K) f32 IoU matrix to a (K, K) int8 mask (4x
    less HBM) and drops the separate masking passes the greedy fixpoint
    otherwise runs. Class ids ride the spare field 5 of the 8-wide
    box layout.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    # strict-upper-triangle: tile dead unless its max col exceeds min row
    needed = (j * block_m + block_m - 1) > (i * block_n)

    @pl.when(jnp.logical_not(needed))
    def _zero():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    @pl.when(needed)
    def _compute():
        inter, area_a, area_b = _inter_areas_tile(a_ref, b_ref, algo)
        ri = jax.lax.broadcasted_iota(jnp.int32, (block_n, block_m), 0) \
            + i * block_n
        ci = jax.lax.broadcasted_iota(jnp.int32, (block_n, block_m), 1) \
            + j * block_m
        # divide-free threshold: inter/(A+B−inter) > thr algebraically ⇔
        # inter·(1+thr) > thr·(A+B) (denominator > 0: inter is clamped to
        # min(A,B) ≤ A+B); zero-padded rows give 0 > 0 = False on both
        # forms. Skips the per-pair divide + _EPS of the matrix kernel —
        # keep decisions can differ from the matrix path only for pairs
        # within FP rounding (~1e-7 relative) of the threshold itself.
        over = inter * (1.0 + iou_thr) > iou_thr * (area_a + area_b)
        kill = over & (ci > ri)
        if use_cls:
            same = a_ref[:, 5][:, None] == b_ref[5, :][None, :]
            kill = kill & same
        out_ref[:, :] = kill.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("iou_thr", "block_n", "block_m",
                                             "interpret", "algo"))
def skew_kill_matrix_pallas(boxes: jnp.ndarray,
                            cls_id: Optional[jnp.ndarray] = None,
                            iou_thr: float = 0.4,
                            block_n: Optional[int] = None,
                            block_m: Optional[int] = None,
                            interpret: bool = False,
                            algo: str = "green") -> jnp.ndarray:
    """Greedy-NMS kill mask for score-sorted boxes: (K, 5) -> (K, K) int8.

    ``kill[i, j] = 1`` iff row i suppresses row j when kept: strictly
    upper-triangular (rows are score-descending), same class (when
    ``cls_id`` given), exact skew-IoU > ``iou_thr`` via the divide-free
    predicate inter·(1+thr) > thr·(A+B) — algebraically the same
    comparison the matrix path makes on its f32 IoU values, so keep masks
    can differ from it only for pairs within FP rounding of the threshold
    (pinned in tests/test_nms.py / test_pallas.py). Feed to
    ``rotated_nms.greedy_suppress_fixpoint_kill``.

    ``block_n``/``block_m`` default by capacity: (128, 256) when K is a
    multiple of 256 (the 512-dense configuration's measured best, −3% vs
    (64, 128); docs/PERF.md sweep), else (64, 128).
    """
    n = boxes.shape[0]
    if block_n is None:
        block_n = 128 if n % 256 == 0 else 64
    if block_m is None:
        block_m = 256 if n % 256 == 0 else 128
    a_aos = _prepare_aos(boxes, block_n)
    b_soa = _prepare_soa(boxes, block_m)
    if cls_id is not None:
        clsf = cls_id.astype(jnp.float32)
        a_aos = a_aos.at[:n, 5].set(clsf)
        b_soa = b_soa.at[5, :n].set(clsf)
    n_pad, m_pad = a_aos.shape[0], b_soa.shape[1]

    grid = (n_pad // block_n, m_pad // block_m)
    out = pl.pallas_call(
        functools.partial(_kill_tile_kernel, block_n=block_n,
                          block_m=block_m, iou_thr=iou_thr,
                          use_cls=cls_id is not None, algo=algo),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.int8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_m), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, block_m), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a_aos, b_soa)
    return out[:n, :n]


def skew_iou_matrix_auto_nms(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix for greedy NMS: upper triangle exact, rest unspecified.

    On TPU the Pallas kernel skips at/below-diagonal tiles (they are never
    read: suppression only flows from higher-ranked rows to lower-ranked
    columns). The jnp fallback returns the full matrix — identical on the
    read region, so CPU/TPU NMS keep masks stay bit-equal."""
    from .skew_iou import skew_iou_matrix

    if jax.default_backend() == "tpu":
        return skew_iou_matrix_pallas(a, b, triangle=True)
    return skew_iou_matrix(a, b)
