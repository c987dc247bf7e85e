#!/usr/bin/env python
"""Dense-capacity (max_det=512) inference stage decomposition, round 4.

Times a ladder of cumulative programs on the product path shapes (B=128,
608x608, bf16 backbone, field-major heads) with the honest scan protocol
(bench.py docstring): K scan iterations inside one jit, fresh inputs per
trial, scalar-fetch sync.

Programs (cumulative unless noted):
  bb        backbone + heads only
  scores    + field-major scores (no top-k)
  topk      + approx_max_k (consume scores+indices)
  gather    + Pallas row gather of the top-512 cell rows (no decode math)
  decode    + full decode_gathered (boxes for the 512 rows)
  full_r3   full product path, UNfused greedy (r3 two-stage kill+fixpoint)
  full      full product path, fused single-kernel NMS (r4 default)
  full_g2   fused, iou_algo="green2"
  product   EXACTLY bench.py's program shape: scan Detector.infer_fn with
            fused params CLOSED OVER (XLA constants). NOTE: bench.py and
            detector.py pass params as a jit ARGUMENT — see product_arg.
  product_arg  scan Detector.infer_fn with fused params passed as a jit
            argument (bench.py/detector.py's exact calling convention).
            product vs product_arg isolates the closure-vs-argument cost.

Usage: python _scratch/dense_decomp.py [program ...]   (default: all)
Env:   MAXDET=128|512 overrides the capacity (default 512).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from rotate_yolov3_tpu.detector import Detector
from rotate_yolov3_tpu.models.yolo_head import decode_gathered, head_scores
from rotate_yolov3_tpu.ops.rotated_nms import non_max_suppression_fused

B, S, K, TRIALS = 128, 608, 16, 2
MAXDET = int(os.environ.get("MAXDET", "512"))
CFG = "/root/repo/cfg/yolov3-rotate-hrsc.cfg"
CONF = 0.05


def fresh_stack(seed):
    r = np.random.default_rng(seed)
    arr = r.integers(0, 255, (K, B, S, S, 3), dtype=np.uint8)
    dev = jax.device_put(jnp.asarray(arr))
    float(jnp.sum(dev[0, 0, 0, 0]))
    return dev


def main(which):
    det = Detector(CFG, img_size=S, conf_thres=CONF, nms_thres=0.4,
                   max_det=MAXDET, compute_dtype=jnp.bfloat16)
    fused = det.fused_params
    spec = det._infer_spec
    yolo_specs = spec.yolo_specs
    from rotate_yolov3_tpu.models.darknet import apply_fused

    def heads_of(imgs):
        return apply_fused(spec, fused, imgs.astype(jnp.bfloat16))

    def run(name, per_batch, with_params_arg=False):
        if with_params_arg:
            @jax.jit
            def loop(fp, stack):
                def body(c, imgs):
                    return c + per_batch(fp, imgs), None
                c, _ = jax.lax.scan(body, jnp.float32(0), stack)
                return c
            call = lambda stack: loop(fused, stack)
        else:
            @jax.jit
            def loop(stack):
                def body(c, imgs):
                    return c + per_batch(imgs), None
                c, _ = jax.lax.scan(body, jnp.float32(0), stack)
                return c
            call = loop

        float(call(fresh_stack(0)))
        best = 1e9
        for trial in range(TRIALS):
            stack = fresh_stack(trial + 1)
            t0 = time.perf_counter()
            v = float(call(stack))
            best = min(best, time.perf_counter() - t0)
        ms_img = best / (K * B) * 1e3
        print(f"{name:10s} {ms_img*1e3:8.1f} us/img  "
              f"{K*B/best:7.1f} img/s  (checksum {v:.6g})", flush=True)

    if "bb" in which:
        def bb(imgs):
            heads = heads_of(imgs)
            return sum(jnp.sum(h.astype(jnp.float32)) for h in heads)
        run("bb", bb)

    if "scores" in which:
        def sc(imgs):
            heads = heads_of(imgs)
            s = jnp.concatenate(
                [head_scores(r, ys, field_major=True)
                 for r, ys in zip(heads, yolo_specs)], axis=1)
            return jnp.sum(s.astype(jnp.float32))
        run("scores", sc)

    if "topk" in which:
        def tk(imgs):
            heads = heads_of(imgs)
            s = jnp.concatenate(
                [head_scores(r, ys, field_major=True)
                 for r, ys in zip(heads, yolo_specs)], axis=1)
            ranked = jnp.where(s >= CONF, s, 0.0)
            ts, ti = jax.lax.approx_max_k(ranked, MAXDET)
            return jnp.sum(ts) + jnp.sum(ti.astype(jnp.float32))
        run("topk", tk)

    for tname, tfn in (("topk_str", None), ("topk_ex", "exact")):
        if tname in which:
            from rotate_yolov3_tpu.ops.topk import strided_topk

            def tk2(imgs, exact=(tfn == "exact")):
                heads = heads_of(imgs)
                s = jnp.concatenate(
                    [head_scores(r, ys, field_major=True)
                     for r, ys in zip(heads, yolo_specs)], axis=1)
                ranked = jnp.where(s >= CONF, s, 0.0)
                if exact:
                    ts, ti = jax.lax.top_k(ranked, MAXDET)
                else:
                    ts, ti = strided_topk(ranked, MAXDET)
                return jnp.sum(ts) + jnp.sum(ti.astype(jnp.float32))
            run(tname, tk2)

    if "gather" in which:
        from rotate_yolov3_tpu.ops import gather_rows

        def ga(imgs):
            heads = heads_of(imgs)
            s = jnp.concatenate(
                [head_scores(r, ys, field_major=True)
                 for r, ys in zip(heads, yolo_specs)], axis=1)
            ranked = jnp.where(s >= CONF, s, 0.0)
            ts, ti = jax.lax.approx_max_k(ranked, MAXDET)
            na, no = yolo_specs[0].na, yolo_specs[0].no
            cells_all = jnp.concatenate(
                [r.reshape(r.shape[0], -1, na * no) for r in heads], axis=1)
            rc = gather_rows.gather_rows_auto(cells_all, ti // na)
            return jnp.sum(ts) + jnp.sum(rc.astype(jnp.float32))
        run("gather", ga)

    if "decode" in which:
        def de(imgs):
            heads = heads_of(imgs)
            s = jnp.concatenate(
                [head_scores(r, ys, field_major=True)
                 for r, ys in zip(heads, yolo_specs)], axis=1)
            ranked = jnp.where(s >= CONF, s, 0.0)
            ts, ti = jax.lax.approx_max_k(ranked, MAXDET)
            rows = decode_gathered(heads, yolo_specs, ti, field_major=True)
            return jnp.sum(ts) + jnp.sum(rows)
        run("decode", de)

    for name, kw in (
            ("full_r3", dict(fused_greedy=False, decode_kernel=False)),
            ("full_r3_dk", dict(fused_greedy=False, decode_kernel=True)),
            ("full", dict(fused_greedy=True)),
            ("full_g2", dict(fused_greedy=True, iou_algo="green2")),
            ("full_bf16", dict(fused_greedy=True, mask_dtype="bfloat16"))):
        if name in which:
            def fu(imgs, kw=kw):
                heads = heads_of(imgs)
                dets, mask = non_max_suppression_fused(
                    heads, yolo_specs, conf_thres=CONF, nms_thres=0.4,
                    max_det=MAXDET, approx_top_k=True, field_major=True,
                    **kw)
                return jnp.sum(dets) + jnp.sum(mask)
            run(name, fu)

    if "product" in which:
        # Detector.infer_fn at the product defaults, fused params CLOSED
        # OVER (XLA constants — the ladder variants' convention).
        def pr(imgs):
            dets, mask = det.infer_fn(fused, imgs)
            return jnp.sum(dets) + jnp.sum(mask)
        run("product", pr)

    if "product_arg" in which:
        # Same program, params passed as a jit ARGUMENT — bench.py's and
        # detector.py's actual calling convention.
        def pra(fp, imgs):
            dets, mask = det.infer_fn(fp, imgs)
            return jnp.sum(dets) + jnp.sum(mask)
        run("product_arg", pra, with_params_arg=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["bb", "scores", "topk", "topk_str", "topk_ex",
                             "gather", "decode", "full_r3", "full",
                             "full_g2", "full_bf16", "product",
                             "product_arg"]
    main(which)
