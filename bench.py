#!/usr/bin/env python
"""Benchmark: 608x608 end-to-end inference throughput (images/sec/chip).

The headline metric from BASELINE.md: full Darknet-53 rotate-yolov3,
bfloat16 conv stack, decode + rotated NMS fused in the same XLA program
(Pallas skew-IoU kernel on TPU), steady-state over the single real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 1000 (the driver-set >=1000 img/s/chip target —
no published reference numbers were recoverable, see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))


def bench(batch_size: int = 16, iters: int = 30, warmup: int = 5,
          img_size: int = 608, max_det: int = 128) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rotate_yolov3_tpu.config.parse import parse_model_cfg
    from rotate_yolov3_tpu.models import (apply_fused, build_network,
                                          decode_all, fuse_bn, init_params)
    from rotate_yolov3_tpu.ops.rotated_nms import non_max_suppression

    spec = build_network(
        parse_model_cfg(os.path.join(ROOT, "cfg/yolov3-rotate-hrsc.cfg")),
        img_size=img_size)
    params, state = init_params(spec, jax.random.PRNGKey(0))
    fused = fuse_bn(spec, params, state)
    fused = jax.tree.map(lambda a: a.astype(jnp.bfloat16), fused)

    @jax.jit
    def infer(fused_params, images):
        x = images.astype(jnp.bfloat16) * (1.0 / 255.0)
        heads = apply_fused(spec, fused_params, x)
        heads = [h.astype(jnp.float32) for h in heads]
        pred = decode_all(heads, spec.yolo_specs)
        return non_max_suppression(pred, conf_thres=0.3, nms_thres=0.4,
                                   max_det=max_det)

    rng = np.random.default_rng(0)
    images = jax.device_put(jnp.asarray(
        rng.integers(0, 255, (batch_size, img_size, img_size, 3)),
        jnp.uint8))

    for _ in range(warmup):
        dets, mask = infer(fused, images)
    dets.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(iters):
        dets, mask = infer(fused, images)
    dets.block_until_ready()
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    ips = bench(batch_size=bs)
    print(json.dumps({
        "metric": "608x608_inference_throughput",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / 1000.0, 4),
    }))
