"""Single-kernel rotated NMS: boxes -> greedy keep mask, one Pallas program.

Fuses the two device stages of the r3 NMS tail — the pairwise kill-mask
kernel (``skew_iou_pallas.skew_kill_matrix_pallas``) and the fixpoint
greedy suppression (``rotated_nms.greedy_suppress_fixpoint_kill``, an XLA
``while_loop`` of whole-matrix passes) — into ONE Pallas program per
image. This is the TPU-native shape of the reference's RRPN-lineage CUDA
NMS (SURVEY.md §2 "rotated NMS"): where the reference launches an IoU
kernel and walks the mask on the host, here the (K, K) suppression mask
lives and dies in VMEM scratch and never touches HBM.

Phase 1 — kill matrix into VMEM scratch. A (batch, row-tile, col-tile)
grid; each step computes one (BN, BM) tile of the kill mask — exact
skew-IoU by Green's-theorem slab clipping (``ops.skew_iou_green``), the
divide-free threshold ``inter·(1+thr) > thr·(A+B)``, strict-upper-triangle
and same-class masks folded in — and stores it to the persistent (K, K)
scratch (TPU grids iterate sequentially on the core, so scratch carries
across steps). Whole at/below-diagonal tiles are zero-filled without
computing, exactly like the r3 kernel. The per-step VMEM stack is one
tile's temporaries (a statically-unrolled row ladder was measured 25.5 MB
of scoped stack — Mosaic does not reuse stack across unrolled iterations).

Phase 2 — greedy fixpoint in-kernel, on the image's LAST grid step.
``keep`` is iterated to the greedy fixpoint (see
``rotated_nms.greedy_suppress_fixpoint`` for the proof that the fixpoint
equals sequential greedy): each pass is one (8, K) x (K, K) MXU matvec
against the scratch mask (the keep vector rides all 8 sublanes of a native
VPU tile — replication is free and avoids 1-row matmuls), with a scalar
change-count as the ``while_loop`` exit test. Typical detection data
converges in 3-7 passes of ~0.5 MFLOP each.

Equivalence: identical keep decisions to the unfused pair (kill kernel +
XLA fixpoint) by construction — same predicate, same iteration — pinned in
tests/test_nms_fused.py (interpret mode on CPU) and by the compiled-mode
TPU smoke (tools/tpu_kernel_smoke.py).

**r5 measurement note:** the on-chip A/B at the dense capacity (K=512,
B=128 product path) measured this fused kernel ~11 µs/img SLOWER than the
two-stage pair it replaces (1015.8 vs 1027.0 img/s; green2 1021.3, bf16
mask 1016.9 — docs/PERF.md r5). The kill tiles are identical work in
both, so the deficit sits in the greedy phase; the plausible mechanism
(unprofiled — the remote backend exposes no per-kernel trace) is that the
in-kernel matvec fixpoint serializes on the core behind the grid, while
the XLA fixpoint's passes can overlap other per-image work and use the
full MXU tiling. The product default is
therefore the two-stage path (``non_max_suppression_fused(...,
fused_greedy=False)``); this kernel remains as an option and cross-check
(and the merge stage of ``data.dota.device_tiles`` still uses it, where
K=1024 exceeds the two-stage kill kernel's measured-good range and the
call is once per scene).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .skew_iou_green import inter_area_green, inter_area_green_bframe

# Kill-matrix scratch is (K, K) in mask_dtype (f32 default, bf16 optional);
# cap K so the f32 WORST CASE plus one tile's green temporaries stays well
# inside v5e's ~16 MB VMEM (K=1024 -> 4 MB f32 scratch).
_MAX_K = 1024


def _nms_kernel(a_ref, b_ref, valid_ref, keep_ref, kill_s, keep_s, *,
                k, block_n, block_m, iou_thr, use_cls, algo):
    """One (BN, BM) kill tile; greedy fixpoint on the image's last step."""
    mask_dt = kill_s.dtype
    i = pl.program_id(1)
    j = pl.program_id(2)
    last = ((i == pl.num_programs(1) - 1) & (j == pl.num_programs(2) - 1))
    # strict-upper-triangle: tile dead unless its max col exceeds min row
    needed = (j * block_m + block_m - 1) > (i * block_n)
    r0 = pl.multiple_of(i * block_n, block_n)
    c0 = pl.multiple_of(j * block_m, block_m)

    @pl.when(jnp.logical_not(needed))
    def _zero():
        kill_s[pl.ds(r0, block_n), pl.ds(c0, block_m)] = \
            jnp.zeros((block_n, block_m), mask_dt)

    @pl.when(needed)
    def _compute():
        ablk = a_ref[0]                                  # (BN, 8)
        bblk = b_ref[0]                                  # (8, BM)
        acx = ablk[:, 0][:, None]
        acy = ablk[:, 1][:, None]
        aw = ablk[:, 2][:, None]
        ah = ablk[:, 3][:, None]
        ath = ablk[:, 4][:, None]
        bcx = bblk[0][None, :]
        bcy = bblk[1][None, :]
        bw = bblk[2][None, :]
        bh = bblk[3][None, :]
        bth = bblk[4][None, :]

        fn = (inter_area_green_bframe if algo == "green2"
              else inter_area_green)
        inter = fn(acx, acy, aw, ah, ath, bcx, bcy, bw, bh, bth)
        area_a = aw * ah
        area_b = bw * bh
        inter = jnp.minimum(inter, jnp.minimum(area_a, area_b))
        # divide-free threshold (== IoU > thr; see skew_iou_pallas kill
        # kernel): zero-padded rows give 0 > 0 = False
        over = inter * (1.0 + iou_thr) > iou_thr * (area_a + area_b)
        ri = jax.lax.broadcasted_iota(
            jnp.int32, (block_n, block_m), 0) + i * block_n
        ci = jax.lax.broadcasted_iota(
            jnp.int32, (block_n, block_m), 1) + j * block_m
        kill = over & (ci > ri)
        if use_cls:
            kill = kill & (ablk[:, 5][:, None] == bblk[5][None, :])
        kill_s[pl.ds(r0, block_n), pl.ds(c0, block_m)] = \
            kill.astype(mask_dt)

    @pl.when(last)
    def _greedy():
        valid = valid_ref[0]                 # (8, K), rows identical
        keep_s[...] = valid

        def cond(carry):
            it, changed = carry
            return (changed > 0) & (it < k)

        def body(carry):
            it, _ = carry
            keep = keep_s[...]
            # mask entries are 0/1 — exact in bf16 too; accumulate f32
            supp = jax.lax.dot_general(keep.astype(mask_dt), kill_s[...],
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            new = jnp.where(supp > 0.0, 0.0, valid)
            keep_s[...] = new
            changed = jnp.sum(jnp.abs(new - keep))
            return it + 1, changed

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(1.0)))
        keep_ref[0] = keep_s[...]


@functools.partial(jax.jit, static_argnames=("iou_thr", "block_n", "block_m",
                                             "interpret", "algo",
                                             "mask_dtype"))
def nms_greedy_pallas(boxes: jnp.ndarray, cls_id: Optional[jnp.ndarray],
                      valid: jnp.ndarray, iou_thr: float = 0.4,
                      block_n: Optional[int] = None,
                      block_m: Optional[int] = None,
                      interpret: bool = False,
                      algo: str = "green",
                      mask_dtype: str = "float32") -> jnp.ndarray:
    """Batched fused greedy rotated NMS: (B, K, 5) boxes -> (B, K) keep.

    Rows must be score-DESCENDING per image (greedy suppression only flows
    from higher-ranked rows). ``cls_id`` (B, K) enables class-aware
    suppression; ``valid`` (B, K) marks live candidates (padding/below-
    threshold rows never keep nor kill). Exact same keep decisions as
    ``skew_kill_matrix_pallas`` + ``greedy_suppress_fixpoint_kill``.
    Block defaults follow the r3 kill-kernel sweep: (128, 256) at
    256-multiple capacities, else (64, 128) (docs/PERF.md).

    ``mask_dtype="bfloat16"`` stores the (K, K) kill scratch in bf16:
    entries are exactly 0/1 (representable in bf16) and the fixpoint
    matvec accumulates in f32, so keep decisions are bit-identical while
    phase-1 stores and per-pass reads move half the VMEM bytes.
    """
    b, k, _ = boxes.shape
    kp = -(-k // 256) * 256 if k > 128 else 128
    if block_n is None:
        block_n = 128 if kp % 256 == 0 else 64
    if block_m is None:
        block_m = 256 if kp % 256 == 0 else 128
    a_aos = jnp.zeros((b, kp, 8), jnp.float32)
    a_aos = jax.lax.dynamic_update_slice(
        a_aos, boxes[..., :5].astype(jnp.float32), (0, 0, 0))
    if cls_id is not None:
        a_aos = a_aos.at[:, :k, 5].set(cls_id.astype(jnp.float32))
    b_soa = jnp.swapaxes(a_aos, 1, 2)                    # (B, 8, KP)
    validf = jnp.zeros((b, kp), jnp.float32)
    validf = jax.lax.dynamic_update_slice(
        validf, valid.astype(jnp.float32), (0, 0))
    valid8 = jnp.broadcast_to(validf[:, None, :], (b, 8, kp))

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, k=kp, block_n=block_n,
                          block_m=block_m, iou_thr=iou_thr,
                          use_cls=cls_id is not None, algo=algo),
        grid=(b, kp // block_n, kp // block_m),
        in_specs=[
            pl.BlockSpec((1, block_n, 8), lambda ib, i, j: (ib, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_m), lambda ib, i, j: (ib, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, kp), lambda ib, i, j: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, kp), lambda ib, i, j: (ib, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 8, kp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((kp, kp), jnp.dtype(mask_dtype)),
                        pltpu.VMEM((8, kp), jnp.float32)],
        interpret=interpret,
    )(a_aos, b_soa, valid8)
    return keep[:, 0, :k] > 0.0


def nms_greedy_fused_ok(k: int) -> bool:
    """Shape gate for the fused path: the (K, K) mask_dtype VMEM scratch
    (sized here for the f32 worst case) must fit alongside tile temps."""
    return k <= _MAX_K
