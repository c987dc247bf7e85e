#!/usr/bin/env python
"""DeviceTilePipeline throughput on the real chip (VERDICT r3 #2 / r4 #3).

Full-resolution synthetic DOTA-like source images -> merged detections.
Three measurements per source shape:

  1. per-bucket COMPILE cost (build + first call — what a new shape
     bucket costs; CLAUDE.md rule 6: remote compiles are minutes);
  2. steady-state ms/scene, tiles/s, scenes/s for the on-device pipeline
     (R distinct device-resident sources, scalar-fetch sync per call —
     per-call dispatch is part of the product cost here, unlike
     bench.py's scan, because the product ingests one scene at a time);
  3. the HOST split path on the same scenes (numpy tile slicing + cv2
     letterbox + one batched Detector call + host fetch + devkit-style
     merge_tile_detections) — the reference's offline workflow shape,
     minus its two disk round-trips (flattering to the host path).

Usage: python _scratch/tile_bench.py [H,W ...]
       (default: 1024,1024 2048,2048 3072,3072 — DOTA scenes are
        800-4000 px; subsize=1024/gap=200 -> 1/9/16 tiles after
        slide-multiple bucketing)
"""
from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from rotate_yolov3_tpu.data.dota.device_tiles import DeviceTilePipeline
from rotate_yolov3_tpu.detector import Detector

R = 6


def bench_shape(det, pipe, h, w):
    t = pipe.num_tiles(h, w)
    hp, wp = pipe.bucket_shape(h, w)
    print(f"--- source {h}x{w} -> bucket {hp}x{wp}, {t} tiles/scene",
          flush=True)

    rng = np.random.default_rng(0)
    srcs_np = [rng.integers(0, 255, (hp, wp, 3), dtype=np.uint8)
               for _ in range(R)]
    srcs = [jnp.asarray(s) for s in srcs_np]
    for s in srcs:
        float(jnp.sum(s[0, 0]))                    # finish transfers

    # 1. compile cost for this bucket (cold only on the first-ever run;
    #    the persistent cache makes re-runs report the cached cost)
    t0 = time.perf_counter()
    fn = pipe._compiled.get((hp, wp)) or pipe._build(hp, wp)
    pipe._compiled[(hp, wp)] = fn
    d, m = fn(det.fused_params, srcs[0])
    float(jnp.sum(d) + jnp.sum(m))
    print(f"compile+first-call: {time.perf_counter() - t0:.1f} s",
          flush=True)

    # 2. steady-state device pipeline
    best = 1e9
    for trial in range(3):
        t0 = time.perf_counter()
        acc = 0.0
        for s in srcs:
            d, m = fn(det.fused_params, s)
            acc += float(jnp.sum(d) + jnp.sum(m))
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"  device trial {trial}: {dt / R * 1e3:.1f} ms/scene "
              f"(checksum {acc:.6g})", flush=True)
    print(f"device pipeline: {best / R * 1e3:.1f} ms/scene = "
          f"{R * t / best:.1f} tiles/s = {R / best:.2f} scenes/s",
          flush=True)

    # 3. host split path on the same scenes: numpy tile slice + cv2
    #    letterbox + ONE batched Detector call + fetch + host merge.
    from rotate_yolov3_tpu.data.dota.img_split import split_image, tile_name
    from rotate_yolov3_tpu.data.dota.result_merge import \
        merge_tile_detections
    from rotate_yolov3_tpu.data.letterbox import letterbox
    from rotate_yolov3_tpu.detector import detections_to_numpy
    from rotate_yolov3_tpu.ops.boxes import scale_coords_rotated

    def host_path(src):
        tiles = split_image(src, [], subsize=pipe.subsize, gap=pipe.gap)
        lbs, metas = [], []
        for (x0, y0), timg, _ in tiles:
            lb, ratio, pad = letterbox(timg, det.img_size)
            lbs.append(lb)
            metas.append(((x0, y0), ratio, pad))
        dets, mask = det(np.stack(lbs))
        per_tile = detections_to_numpy(dets, mask)
        tile_dets = {}
        for ((x0, y0), ratio, pad), d in zip(metas, per_tile):
            if len(d):
                d = np.asarray(scale_coords_rotated(jnp.asarray(d),
                                                    ratio, pad))
            tile_dets[tile_name("img", x0, y0)] = d
        return merge_tile_detections(tile_dets,
                                     nms_thres=pipe.merge_nms_thres)

    host_path(srcs_np[0])                          # compile the det batch
    best_h = 1e9
    for trial in range(2):
        t0 = time.perf_counter()
        n = 0
        for s in srcs_np:
            merged = host_path(s)
            n += sum(len(v) for v in merged.values())
        dt = time.perf_counter() - t0
        best_h = min(best_h, dt)
        print(f"  host trial {trial}: {dt / R * 1e3:.1f} ms/scene "
              f"({n} merged dets)", flush=True)
    print(f"host split path: {best_h / R * 1e3:.1f} ms/scene = "
          f"{R / best_h:.2f} scenes/s  "
          f"(device/host = {best_h / best:.2f}x)", flush=True)


def main(shapes):
    det = Detector("/root/repo/cfg/yolov3-rotate-dota.cfg", img_size=608,
                   conf_thres=0.05, nms_thres=0.4, max_det=512,
                   compute_dtype=jnp.bfloat16)
    pipe = DeviceTilePipeline(det, subsize=1024, gap=200,
                              merge_nms_thres=0.3, max_merged=1024)
    for (h, w) in shapes:
        bench_shape(det, pipe, h, w)


if __name__ == "__main__":
    shapes = [tuple(int(v) for v in a.split(",")) for a in sys.argv[1:]] \
        or [(1024, 1024), (2048, 2048), (3072, 3072)]
    main(shapes)
