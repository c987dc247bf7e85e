#!/usr/bin/env python
"""Compiled-mode Pallas kernel smoke test on the real TPU (~1 min).

The test suite runs every Pallas kernel in INTERPRET mode on CPU
(tests/conftest.py forces the backend — this machine's TPU is single-client
and tests must never grab it), so Mosaic-lowering regressions are invisible
to pytest; only bench.py checksums would catch them, rarely and indirectly.
This script closes that gap (VERDICT r3 weak #4): it runs each kernel
COMPILED on the real chip against pure-jnp oracles and prints one PASS/FAIL
line per kernel + a JSON summary. Record the result in docs/PERF.md each
round.

Kernels covered:
  * skew_iou_matrix_pallas  (green + candidates algos) vs jnp skew_iou_matrix
  * skew_kill_matrix_pallas (divide-free kill predicate) vs jnp threshold
  * nms_greedy_pallas       (fused kill+greedy single kernel) vs jnp fixpoint
  * gather_rows_pallas      vs jnp.take_along_axis

Safety: starts with a small-matmul probe under a hard watchdog — if the
axon relay is dead every device op hangs forever (CLAUDE.md rule 9), and a
hung smoke must not wedge the caller.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _watchdog(seconds: float):
    def fire():
        print(json.dumps({"ok": False,
                          "error": f"watchdog: no result in {seconds}s "
                                   "(TPU tunnel dead? CLAUDE.md rule 9)"}),
              flush=True)
        os._exit(3)
    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main() -> int:
    _watchdog(float(os.environ.get("SMOKE_TIMEOUT", "900")))
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    # --- probe ---
    t0 = time.time()
    x = jnp.ones((256, 256), jnp.bfloat16)
    assert float((x @ x).sum()) == 256 ** 3, "probe matmul wrong"
    print(f"probe ok ({jax.devices()[0].platform}, {time.time()-t0:.1f}s)",
          flush=True)
    assert jax.default_backend() != "cpu", "smoke must run on the TPU"

    from rotate_yolov3_tpu.ops.gather_rows import gather_rows_pallas
    from rotate_yolov3_tpu.ops.nms_pallas import nms_greedy_pallas
    from rotate_yolov3_tpu.ops.rotated_nms import greedy_suppress_fixpoint
    from rotate_yolov3_tpu.ops.skew_iou import skew_iou_matrix
    from rotate_yolov3_tpu.ops.skew_iou_pallas import (
        skew_iou_matrix_pallas, skew_kill_matrix_pallas)

    rng = np.random.default_rng(0)
    results = {}

    def check(name, ok, detail=""):
        results[name] = bool(ok)
        print(f"{'PASS' if ok else 'FAIL'} {name} {detail}", flush=True)

    n = 512
    boxes = np.stack([
        rng.uniform(0, 600, n), rng.uniform(0, 600, n),
        rng.uniform(5, 60, n), rng.uniform(5, 60, n),
        rng.uniform(-np.pi, np.pi, n)], axis=1).astype(np.float32)
    jb = jnp.asarray(boxes)
    ref_iou = np.asarray(skew_iou_matrix(jb, jb))

    for algo in ("green", "green2", "candidates"):
        m = np.asarray(skew_iou_matrix_pallas(jb, jb, algo=algo))
        err = np.abs(m - ref_iou).max()
        check(f"iou_matrix[{algo}]", err < 2e-3, f"maxerr {err:.2e}")

    thr = 0.4
    tri = np.arange(n)[:, None] < np.arange(n)[None, :]
    ref_kill = (ref_iou > thr) & tri
    for algo in ("green", "green2"):
        kill = np.asarray(skew_kill_matrix_pallas(jb, None, iou_thr=thr,
                                                  algo=algo)) != 0
        diff = int((kill != ref_kill).sum())
        # divide-free predicate: only threshold-boundary FP flips allowed
        boundary = np.abs(ref_iou - thr) < 1e-4
        ok = ((kill != ref_kill) <= boundary).all()
        check(f"kill_matrix[{algo}]", ok, f"{diff} diffs (boundary-only)")

    valid = jnp.ones((n,), bool)
    ref_keep = np.asarray(greedy_suppress_fixpoint(
        jnp.asarray(ref_iou), valid, thr))
    for algo in ("green", "green2"):
        keep = np.asarray(nms_greedy_pallas(
            jb[None], None, valid[None], iou_thr=thr, algo=algo))[0]
        diff = int((keep != ref_keep).sum())
        check(f"nms_fused[{algo}]", diff == 0, f"{diff} keep diffs")
    # class-aware variant
    cls_id = jnp.asarray(rng.integers(0, 15, n).astype(np.int32))
    same = np.asarray(cls_id)[:, None] == np.asarray(cls_id)[None, :]
    ref_keep_c = np.asarray(greedy_suppress_fixpoint(
        jnp.asarray(np.where(same, ref_iou, 0.0)), valid, thr))
    keep_c = np.asarray(nms_greedy_pallas(
        jb[None], cls_id[None], valid[None], iou_thr=thr))[0]
    check("nms_fused[cls]", (keep_c == ref_keep_c).all(),
          f"{int((keep_c != ref_keep_c).sum())} keep diffs")

    cells = rng.normal(size=(4, 7581, 42)).astype(np.float32)
    idx = rng.integers(0, 7581, (4, 512)).astype(np.int32)
    jc, ji = jnp.asarray(cells), jnp.asarray(idx)
    g = np.asarray(gather_rows_pallas(jc, ji))
    ref_g = np.asarray(jnp.take_along_axis(jc, ji[..., None], axis=1))
    check("gather_rows", (g == ref_g).all(),
          f"maxerr {np.abs(g - ref_g).max():.2e}")

    # decode kernel (one-hot-matmul gather + in-kernel decode) vs the jnp
    # reference decode on a full Darknet-53 head set
    from rotate_yolov3_tpu.config.parse import parse_model_cfg
    from rotate_yolov3_tpu.models.darknet import build_network
    from rotate_yolov3_tpu.models.yolo_head import decode_gathered
    from rotate_yolov3_tpu.ops.decode_pallas import (decode_rows_pallas,
                                                     heads_meta)

    spec = build_network(parse_model_cfg(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "cfg/yolov3-rotate-hrsc.cfg")),
        img_size=608)
    ys = spec.yolo_specs
    na, no, nc2 = ys[0].na, ys[0].no, ys[0].num_classes
    heads = []
    n_total = 0
    for s in ys:
        g_ = 608 // s.stride
        heads.append(jnp.asarray(
            rng.normal(0, 0.7, (2, g_, g_, s.na * s.no)), jnp.bfloat16))
        n_total += g_ * g_ * s.na
    didx = jnp.asarray(rng.integers(0, n_total, (2, 512)).astype(np.int32))
    dvalid = jnp.ones((2, 512), bool)
    cells2 = jnp.concatenate(
        [r.reshape(r.shape[0], -1, na * no) for r in heads], axis=1)
    meta = heads_meta(ys, [r.shape for r in heads])
    aos = np.asarray(decode_rows_pallas(cells2, didx, dvalid, meta, na=na,
                                        nc=nc2, field_major=True))
    ref_rows = np.asarray(decode_gathered(heads, ys, didx,
                                          field_major=True))[..., :5]
    err = np.abs(aos[..., :5] - ref_rows).max()
    check("decode_rows", err < 1e-3, f"maxerr {err:.2e}")

    # the same decode kernel at DOTA shapes (nc=15): the class-argmax path
    # must compile within the 16 MB scoped-VMEM stack — a python-unrolled
    # argmax chain OOM'd here (17.9 MB, r4) because Mosaic does not reuse
    # stack across unrolled iterations; the fori_loop form is the fix.
    # Checks boxes AND the argmax class id against the jnp reference.
    spec_d = build_network(parse_model_cfg(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "cfg/yolov3-rotate-dota.cfg")),
        img_size=608)
    ys_d = spec_d.yolo_specs
    na_d, no_d, nc_d = ys_d[0].na, ys_d[0].no, ys_d[0].num_classes
    heads_d, n_total_d = [], 0
    for s in ys_d:
        g_ = 608 // s.stride
        heads_d.append(jnp.asarray(
            rng.normal(0, 0.7, (2, g_, g_, s.na * s.no)), jnp.bfloat16))
        n_total_d += g_ * g_ * s.na
    didx_d = jnp.asarray(
        rng.integers(0, n_total_d, (2, 512)).astype(np.int32))
    dvalid_d = jnp.ones((2, 512), bool)
    cells_d = jnp.concatenate(
        [r.reshape(r.shape[0], -1, na_d * no_d) for r in heads_d], axis=1)
    meta_d = heads_meta(ys_d, [r.shape for r in heads_d])
    try:
        aos_d = np.asarray(decode_rows_pallas(
            cells_d, didx_d, dvalid_d, meta_d, na=na_d, nc=nc_d,
            field_major=True))
        ref_d = np.asarray(decode_gathered(heads_d, ys_d, didx_d,
                                           field_major=True))
        err_b = np.abs(aos_d[..., :5] - ref_d[..., :5]).max()
        cls_ref = ref_d[..., 6:].argmax(-1)
        cls_diffs = int((aos_d[..., 5] != cls_ref).sum())
        check("decode_rows_nc15", err_b < 1e-3 and cls_diffs == 0,
              f"maxerr {err_b:.2e}, {cls_diffs} cls diffs")
    except Exception as e:  # compile OOM shows up here
        check("decode_rows_nc15", False, str(e).splitlines()[0][:120])

    # strided_topk compiled on TPU vs its own (backend-identical) CPU
    # semantics, plus the approx_max_k adjacent-cell drop MEASUREMENT
    # (VERDICT r3 weak #3): two peaks na=18 flat indices apart — adjacent
    # grid cells — swept across alignments. Measured result (r4, v5e):
    # approx_max_k drops NOTHING at these shapes (0/86; also 0 at every
    # spacing 1..512 in the gap sweep) — its window reduction happens to
    # spare them here, but that is unspecified behavior; strided_topk must
    # never drop either BY CONSTRUCTION, which is the gate below.
    from rotate_yolov3_tpu.ops.topk import strided_topk

    n_sc, k_sc, na_sc = 131_072, 128, 18
    base = np.linspace(0.0, 0.1, n_sc).astype(np.float32)
    starts = list(range(0, n_sc - 2 * na_sc, 3067))
    drops_approx = 0
    drops_strided = 0
    for st in starts:
        s = base.copy()
        s[st] = 0.9
        s[st + na_sc] = 0.8
        js = jnp.asarray(s[None])
        _, ia = jax.lax.approx_max_k(js, k_sc)
        _, istr = strided_topk(js, k_sc)
        got_a = set(np.asarray(ia)[0].tolist())
        got_s = set(np.asarray(istr)[0].tolist())
        drops_approx += (st not in got_a) + (st + na_sc not in got_a)
        drops_strided += (st not in got_s) + (st + na_sc not in got_s)
    check("topk_strided_adjacent", drops_strided == 0,
          f"0/{2*len(starts)} dropped")
    # evidence line, not a gate: records the measured approx_max_k drop
    # count (0 at product shapes) that calibrates why it was retired —
    # unspecified semantics, not an observed accuracy bug
    print(f"INFO approx_max_k adjacent-cell drops: {drops_approx}/"
          f"{2*len(starts)} peaks lost (strided: {drops_strided})",
          flush=True)
    results["approx_max_k_drops"] = drops_approx

    ok = all(v for k_, v in results.items() if k_ != "approx_max_k_drops")
    print(json.dumps({"ok": ok, "results": results}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
