"""Batched row gather as a Pallas TPU kernel: (B, N, C)[(B, K)] -> (B, K, C).

The decode stage of the score-first inference path gathers the top-K
candidate cell rows out of the concatenated head maps
(``models.yolo_head.decode_gathered``). XLA lowers that
``take_along_axis`` to a generic gather at ~28 cycles per row on this
backend (measured, docs/PERF.md) — the dominant cost of the decode stage
at dense capacity (K=512). This kernel keeps each image's (N, C) cell
block VMEM-resident and extracts rows with aligned vector loads instead:

  * dynamic sublane accesses must be aligned to the dtype's sublane tile
    on this backend (8 rows for 4-byte types, 16 for 2-byte, 32 for
    1-byte), so row ``i`` is fetched as its aligned ``(A, C)`` block and
    the target sublane is isolated with an ``iota == i%A`` mask-reduce
    (3 cheap VPU ops on an (A, C) tile);
  * A extracted rows accumulate into an (A, C) register block that is
    stored with one aligned write every A-th row — output writes stay
    tile-aligned too.

Indices arrive via scalar prefetch (SMEM) so the loop bounds and slice
offsets are scalars, not vectors. Out-of-range indices are clipped (XLA
GatherScatterMode.CLIP semantics — same contract as the jnp path).

Use ``gather_rows_auto`` for the product path: Pallas on TPU (when the
shape constraints hold), ``jnp.take_along_axis`` everywhere else —
bit-identical outputs by construction (pure data movement; equivalence
pinned in tests/test_gather_rows.py, interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-image VMEM budget for the resident (N, C) block (bytes). v5e has
# ~16 MB of VMEM per core; the kernel needs the block plus small
# temporaries. 608-px heads are ~1.9 MB (7584x128 lanes bf16); 1024-px
# DOTA tiles ~5.5 MB. Beyond the cap, fall back to the XLA gather.
_VMEM_CAP = 8 * 1024 * 1024


def _sublane_align(dtype) -> int:
    """Sublane-tile row alignment for dynamic slices of this dtype."""
    return max(8, 32 // jnp.dtype(dtype).itemsize)


def _gather_kernel(idx_ref, cells_ref, out_ref, *, k, align):
    c = cells_ref.shape[-1]
    sub = jax.lax.broadcasted_iota(jnp.int32, (align, c), 0)
    b = pl.program_id(0)

    def outer(g, _):
        rows = []
        for u in range(align):                              # static unroll
            i = idx_ref[b, g * align + u]
            base = pl.multiple_of((i // align) * align, align)
            blk = cells_ref[0, pl.ds(base, align), :]       # aligned load
            rows.append(jnp.sum(jnp.where(sub == (i % align), blk, 0),
                                axis=0, keepdims=True))     # (1, C)
        # stacking via sublane concatenate — a placement select
        # (where(sub == u, row, acc)) trips an unimplemented Mosaic i1
        # relayout ({0,*} -> {*,0}) on the real compiler (never in
        # interpret mode); concatenate lowers cleanly
        out_ref[0, pl.ds(pl.multiple_of(g * align, align), align), :] = \
            jnp.concatenate(rows, axis=0)
        return 0

    jax.lax.fori_loop(0, k // align, outer, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows_pallas(cells: jnp.ndarray, idx: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """(B, N, C) cells + (B, K) int32 row indices -> (B, K, C).

    Equals ``jnp.take_along_axis(cells, idx[..., None], axis=1)`` with
    indices clipped to [0, N). K must be a multiple of the dtype's
    sublane alignment (8 for f32, 16 for bf16 — true for every
    ``max_det`` the product uses); N is padded up to it here.
    """
    b, n, c = cells.shape
    k = idx.shape[1]
    align = _sublane_align(cells.dtype)
    assert idx.shape[0] == b and k % align == 0, (idx.shape, cells.shape)
    pad = (-n) % align
    if pad:
        cells = jnp.pad(cells, ((0, 0), (0, pad), (0, 0)))
    idx = jnp.clip(idx.astype(jnp.int32), 0, n - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n + pad, c), lambda i, idx_ref: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, k, c), lambda i, idx_ref: (i, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, k=k, align=align),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, k, c), cells.dtype),
        interpret=interpret,
    )(idx, cells)


def gather_rows_auto(cells: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Pallas on TPU when shapes allow, XLA ``take_along_axis`` otherwise."""
    b, n, c = cells.shape
    k = idx.shape[1]
    align = _sublane_align(cells.dtype)
    # lane dim is padded to 128 in VMEM regardless of C
    vmem = (-(-n // align) * align) * max(c, 128) * cells.dtype.itemsize
    if (jax.default_backend() == "tpu" and k % align == 0
            and vmem <= _VMEM_CAP):
        return gather_rows_pallas(cells, idx)
    return jnp.take_along_axis(cells, idx[..., None].astype(jnp.int32),
                               axis=1, mode="clip")
