"""Pallas TPU kernel: top-K candidate indices -> decoded rotated boxes.

Fuses the two halves of the score-first decode stage
(``models.yolo_head.decode_gathered``) into one kernel per image:

**Gather as an exact one-hot matmul.** The r3 path extracted the top-K
cell rows with aligned vector loads (``ops.gather_rows``) — ~16 us/img at
K=512, bounded by the per-row scalar loop. Here the gather is
``rows = onehot(cell_idx) @ cells``: the (K, T) one-hot tile against each
(T, C) column block of the cell table, accumulated over blocks on the
MXU. Building one-hot tiles is a broadcast compare (VPU) and the matmul
runs at MXU rate (~330 MFLOP at K=512, N=7584 — ~2 us of MXU time), with
no scalar loop anywhere. EXACT, not approximate: every output element is
a dot product with exactly one nonzero term, so ``1.0 * x`` reproduces x
bit-for-bit (bf16 operands, f32 accumulation — same value path as the r3
gather + anchor-selection matmul).

**Decode in-kernel.** Field extraction is a lane-mask reduce per field
(the anchor-dependent lane is ``f*na + a`` field-major / ``a*no + f``
anchor-major); grid cell, stride and anchor w/h/angle metadata are
vector arithmetic on the (K, 1) index columns with static per-head
range selects — the same math as ``yolo_head._decode_gathered_concat``,
which remains the reference implementation (equivalence pinned in
tests/test_decode_pallas.py; transcendentals may differ from XLA by
float rounding only). Output rows are (cx, cy, w, h, theta, cls_id, 0, 0)
with boxes zeroed for invalid rows — exactly the box/cls inputs the
fused NMS kernel (``ops.nms_pallas``) consumes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# column-block width of the one-hot gather matmul
_T = 512
# per-image VMEM budget for the resident cell table (see gather_rows)
_VMEM_CAP = 8 * 1024 * 1024


class HeadMeta(NamedTuple):
    """Static per-head decode tables (hashable: jit-static argument)."""

    n_cells: int                  # H*W
    width: int                    # W
    stride: int
    anchor_w: Tuple[float, ...]   # (na,)
    anchor_h: Tuple[float, ...]
    anchor_a: Tuple[float, ...]


def heads_meta(yolo_specs, head_shapes) -> Tuple[HeadMeta, ...]:
    """Build HeadMeta from YoloSpecs + raw head map shapes (B, H, W, C)."""
    from ..models.yolo_head import head_anchors

    out = []
    for spec, shp in zip(yolo_specs, head_shapes):
        awh, aang = head_anchors(spec)
        out.append(HeadMeta(
            n_cells=int(shp[1] * shp[2]), width=int(shp[2]),
            stride=int(spec.stride),
            anchor_w=tuple(float(v) for v in awh[:, 0]),
            anchor_h=tuple(float(v) for v in awh[:, 1]),
            anchor_a=tuple(float(v) for v in aang)))
    return tuple(out)


def _decode_kernel(cells_ref, cell_ref, a_ref, valid_ref, out_ref, *,
                   k, n_pad, c, na, nc, field_major, meta, angle_range,
                   wh_clamp):
    cellc = cell_ref[0]                           # (K, 1) int32
    ac = a_ref[0]                                 # (K, 1) int32

    # ---- gather: rows[r] = cells[cell[r]] as one-hot matmul ----
    dtype = cells_ref.dtype
    nblk = n_pad // _T

    def body(t, acc):
        blk = cells_ref[0, pl.ds(pl.multiple_of(t * _T, _T), _T), :]
        ci = jax.lax.broadcasted_iota(jnp.int32, (k, _T), 1) + t * _T
        oh = (ci == cellc).astype(dtype)          # (K, T)
        return acc + jax.lax.dot_general(
            oh, blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    rows = jax.lax.fori_loop(0, nblk, body,
                             jnp.zeros((k, c), jnp.float32))  # (K, C) f32

    # ---- field extraction: anchor-dependent lane per field ----
    lanes = jax.lax.broadcasted_iota(jnp.int32, (k, c), 1)

    def fld(f):
        lane = (ac + f * na) if field_major else (ac * (6 + nc) + f)
        return jnp.sum(jnp.where(lanes == lane, rows, 0.0),
                       axis=1, keepdims=True)    # (K, 1)

    tx, ty, tw, th, tt = fld(0), fld(1), fld(2), fld(3), fld(4)

    # ---- per-head grid/stride/anchor metadata (static range selects) ----
    zero = jnp.zeros((k, 1), jnp.float32)
    gx, gy, stride_v = zero, zero, zero
    aw_v, ah_v, aang_v = zero, zero, zero

    def table(vals):
        # anchor lookup as a scalar select chain on the (K, 1) anchor ids
        # (na is ~6; Pallas kernels can't capture array constants)
        acc = zero
        for j, v in enumerate(vals):
            acc = jnp.where(ac == j, float(v), acc)
        return acc

    off = 0
    for m in meta:
        local = cellc - off
        in_h = (local >= 0) & (local < m.n_cells)
        lx = (local % m.width).astype(jnp.float32)
        ly = (local // m.width).astype(jnp.float32)
        gx = jnp.where(in_h, lx, gx)
        gy = jnp.where(in_h, ly, gy)
        stride_v = jnp.where(in_h, float(m.stride), stride_v)
        aw_v = jnp.where(in_h, table(m.anchor_w), aw_v)
        ah_v = jnp.where(in_h, table(m.anchor_h), ah_v)
        aang_v = jnp.where(in_h, table(m.anchor_a), aang_v)
        off += m.n_cells

    # ---- decode (same formulas as yolo_head._decode_rows) ----
    bx = (jax.nn.sigmoid(tx) + gx) * stride_v
    by = (jax.nn.sigmoid(ty) + gy) * stride_v
    bw = aw_v * jnp.exp(jnp.clip(tw, -wh_clamp, wh_clamp))
    bh = ah_v * jnp.exp(jnp.clip(th, -wh_clamp, wh_clamp))
    bt = aang_v + angle_range * jnp.tanh(tt)

    vc = valid_ref[0]                             # (K, 1) f32
    bx, by, bw, bh, bt = (v * vc for v in (bx, by, bw, bh, bt))

    if nc > 1:
        # argmax over class logits == argmax over sigmoids (monotonic).
        # MUST be a fori_loop, not a python unroll: Mosaic does not reuse
        # scoped-VMEM stack across unrolled iterations, and nc-1 live
        # (K, C) f32 temporaries blew the 16 MB stack limit at DOTA's
        # nc=15 (measured compile OOM, 17.9 MB — the loop form compiles
        # to one iteration's stack)
        def cls_body(cc, carry):
            maxi, maxv = carry
            v = fld(6 + cc)
            upd = v > maxv
            return (jnp.where(upd, cc.astype(jnp.float32), maxi),
                    jnp.where(upd, v, maxv))

        maxi, _ = jax.lax.fori_loop(1, nc, cls_body, (zero, fld(6)))
    else:
        maxi = zero

    out_ref[0] = jnp.concatenate(
        [bx, by, bw, bh, bt, maxi, zero, zero], axis=1)   # (K, 8)


@functools.partial(jax.jit, static_argnames=("meta", "na", "nc",
                                             "field_major", "interpret"))
def decode_rows_pallas(cells: jnp.ndarray, idx: jnp.ndarray,
                       valid: jnp.ndarray, meta: Tuple[HeadMeta, ...],
                       na: int, nc: int, field_major: bool = True,
                       interpret: bool = False) -> jnp.ndarray:
    """(B, N, C) cell table + (B, K) global candidate indices -> (B, K, 8).

    Output rows are (cx, cy, w, h, theta, cls_id, 0, 0): decoded boxes in
    net-input pixels (zeroed where ``valid`` is False) + argmax class id.
    ``idx`` is the global flat candidate index (cell-major, anchor-minor,
    heads concatenated) — the same ordering ``decode_gathered`` consumes.
    """
    b, n, c = cells.shape
    k = idx.shape[1]
    n_pad = -(-n // _T) * _T
    if n_pad != n:
        cells = jnp.pad(cells, ((0, 0), (0, n_pad - n), (0, 0)))
    idx = idx.astype(jnp.int32)
    cell_col = (idx // na)[..., None]
    a_col = (idx % na)[..., None]
    valid_col = valid.astype(jnp.float32)[..., None]

    from ..models.yolo_head import _WH_CLAMP, ANGLE_RANGE

    return pl.pallas_call(
        functools.partial(_decode_kernel, k=k, n_pad=n_pad, c=c, na=na,
                          nc=nc, field_major=field_major, meta=meta,
                          angle_range=ANGLE_RANGE, wh_clamp=_WH_CLAMP),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_pad, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, 8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, 8), jnp.float32),
        interpret=interpret,
    )(cells, cell_col, a_col, valid_col)


def decode_rows_fused_ok(n: int, c: int, itemsize: int) -> bool:
    """VMEM gate: the (N, C) cell table must fit the resident budget."""
    n_pad = -(-n // _T) * _T
    return n_pad * max(c, 128) * itemsize <= _VMEM_CAP
