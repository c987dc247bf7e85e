#!/usr/bin/env python
"""DeviceTilePipeline throughput on the real chip (VERDICT r3 task #2).

One full-resolution synthetic DOTA-like source image -> merged detections,
end-to-end inside the jitted pipeline (static-slice tiling + letterbox +
batched detection + coordinate re-map + fused cross-tile merge NMS).

Timing protocol: the pipeline is one jit per source bucket; we time R
repeated calls with DIFFERENT source images (device_put'd up front,
scalar-fetch sync per call — distinct inputs bust the remote exec cache;
per-call dispatch overhead is part of the product cost here, unlike
bench.py's scan, because the product ingests one scene at a time).

Usage: python _scratch/tile_bench.py [H W] (default 3072 3072; DOTA scenes
are 800-4000 px, subsize=1024/gap=200 -> 3072^2 = 16 tiles/scene)
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

H = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
W = int(sys.argv[2]) if len(sys.argv) > 2 else 3072
R = 6


def main():
    det = Detector("/root/repo/cfg/yolov3-rotate-dota.cfg", img_size=608,
                   conf_thres=0.05, nms_thres=0.4, max_det=512,
                   compute_dtype=jnp.bfloat16)
    pipe = DeviceTilePipeline(det, subsize=1024, gap=200,
                              merge_nms_thres=0.3, max_merged=1024)
    t = pipe.num_tiles(H, W)
    print(f"source {H}x{W} -> {t} tiles/scene", flush=True)

    rng = np.random.default_rng(0)
    hp, wp = pipe.bucket_shape(H, W)
    srcs = [jnp.asarray(rng.integers(0, 255, (hp, wp, 3), dtype=np.uint8))
            for _ in range(R)]
    for s in srcs:
        float(jnp.sum(s[0, 0]))                    # finish transfers

    fn = pipe._compiled.get((hp, wp)) or pipe._build(hp, wp)
    pipe._compiled[(hp, wp)] = fn
    d, m = fn(det.fused_params, srcs[0])           # compile
    float(jnp.sum(d) + jnp.sum(m))

    best = 1e9
    for trial in range(2):
        t0 = time.perf_counter()
        acc = 0.0
        for s in srcs:
            d, m = fn(det.fused_params, s)
            acc += float(jnp.sum(d) + jnp.sum(m))
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"trial {trial}: {dt / R * 1e3:.1f} ms/scene "
              f"(checksum {acc:.6g})", flush=True)
    print(f"best: {best / R * 1e3:.1f} ms/scene = "
          f"{R * t / best:.1f} tiles/s = {R / best:.2f} scenes/s "
          f"({t} tiles @ 1024^2, net 608^2, max_det 512, merge 1024)",
          flush=True)


if __name__ == "__main__":
    main()
