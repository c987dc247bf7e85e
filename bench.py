#!/usr/bin/env python
"""Benchmark: 608x608 end-to-end inference throughput (images/sec/chip).

Measures THE PRODUCT PATH: the exact jitted function ``Detector`` runs for
detect.py (``Detector.infer_fn`` at the product defaults — bf16 CANONICAL-
stem Darknet-53 (packed stem measured slower, docs/PERF.md), score-first
APPROX top-k (detect.py's TPU default; test.py/dota.py default exact),
fixed-shape rotated NMS with the Pallas skew-IoU kernel), scanned K times
inside one XLA program. Prints ONE JSON line {"metric", "value", "unit",
"vs_baseline", ...}; since r5, "value" is the MEDIAN of >=4 trials
(extended to 8 until the IQR half-width < 1%) with "max"/"min"/
"spread_pct"/"trials" alongside — max-of-2 could not support the 1-3%
claims kernel work now makes (VERDICT r4 task #4). vs_baseline =
median / 1000 (the driver-set >=1000 img/s/chip target — BASELINE.md
records that no published reference numbers were recoverable).
``python bench.py <batch> <max_det>`` benches other capacities (512 =
the dota.py dense-tile configuration).

Measurement notes (this machine's axon TPU tunnel):
  * `block_until_ready` does NOT synchronize remote execution, and repeated
    executions with identical inputs are served from a remote cache — naive
    timing reports physically impossible numbers (>10 PFLOP/s).
  * Honest protocol, validated against a known-FLOPs matmul reaching
    158 TFLOP/s (~80% of v5e bf16 peak): run K batches inside one jitted
    `lax.scan` (single dispatch, outputs reduced to a scalar), use a fresh
    input per timing run, and synchronize by FETCHING the scalar value.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))


def _enable_compile_cache():
    """Persistent compile cache: remote compiles take minutes; re-runs of
    the same bench should not pay them twice. Safe pre-first-compile."""
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def bench(batch_size: int = 128, scan_iters: int = 16, trials: int = 4,
          max_trials: int = 8, img_size: int = 608, max_det: int = 128,
          conf_thres: float = 0.05, nms_thres: float = 0.4,
          verbose: bool = False) -> dict:
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rotate_yolov3_tpu.detector import Detector

    # conf 0.05 keeps every stage live even with random weights; NMS is
    # fixed-shape so its cost is content-independent anyway.
    det = Detector(os.path.join(ROOT, "cfg/yolov3-rotate-hrsc.cfg"),
                   img_size=img_size, conf_thres=conf_thres,
                   nms_thres=nms_thres, max_det=max_det,
                   compute_dtype=jnp.bfloat16)
    fused = det.fused_params

    # fused params are CLOSED OVER (baked as XLA constants) — the same
    # convention Detector.__call__ serves with (bake_params=True default):
    # weights are fixed after load, and baking measured worth ~35 µs/img
    # at max_det=512 vs passing them as a jit argument (the r5
    # product/product_arg A/B, docs/PERF.md).
    @jax.jit
    def infer_loop(stack):                # stack: (K, B, S, S, 3) uint8
        def body(c, imgs):
            dets, mask = det.infer_fn(fused, imgs)
            # consume outputs so nothing is dead code
            return c + jnp.sum(dets) + jnp.sum(mask), None
        c, _ = jax.lax.scan(body, jnp.float32(0), stack)
        return c

    def fresh_stack(seed):
        r = np.random.default_rng(seed)
        arr = r.integers(0, 255,
                         (scan_iters, batch_size, img_size, img_size, 3),
                         dtype=np.uint8)
        dev = jax.device_put(jnp.asarray(arr))
        float(jnp.sum(dev[0, 0, 0, 0]))   # force the transfer NOW
        return dev

    # warmup/compile on stack 0
    float(infer_loop(fresh_stack(0)))

    # Dispersion-aware protocol (VERDICT r4 task #4): >= `trials` runs,
    # extend up to `max_trials` until the median's spread half-width
    # ((q75-q25)/2 / median) is < 1%. Headline = MEDIAN (max-of-2 could
    # not resolve the 1-3% deltas kernel work now claims; BENCH_r04 showed
    # a 24% trial spread at max_det=128).
    import statistics

    samples = []
    trial = 0
    while trial < trials or (trial < max_trials and len(samples) >= 2 and
                             _half_width(samples) >= 0.01):
        stack = fresh_stack(trial + 1)    # bust the remote exec cache
        t0 = time.perf_counter()
        v = float(infer_loop(stack))
        dt = time.perf_counter() - t0
        ips = scan_iters * batch_size / dt
        if verbose:
            print(f"trial {trial}: {dt*1e3:.1f} ms for "
                  f"{scan_iters}x{batch_size} imgs -> {ips:.1f} img/s "
                  f"(checksum {v:.3g})", file=sys.stderr)
        samples.append(ips)
        trial += 1
    return {
        "median": statistics.median(samples),
        "max": max(samples),
        "min": min(samples),
        "spread_pct": round(_half_width(samples) * 100.0, 2),
        "trials": len(samples),
    }


def _half_width(samples) -> float:
    """Relative IQR half-width of the median: (q75-q25)/2 / median."""
    import statistics

    if len(samples) < 2:
        return float("inf")
    med = statistics.median(samples)
    qs = statistics.quantiles(samples, n=4) if len(samples) >= 3 else \
        [min(samples), med, max(samples)]
    return (qs[2] - qs[0]) / 2.0 / med if med else float("inf")


if __name__ == "__main__":
    # Watchdog: the axon tunnel can die outright (CLAUDE.md rule 9), after
    # which every device op hangs FOREVER with no error — a hung bench would
    # stall the driver. Worst observed healthy run (cold remote compile of
    # both capacities) is well under 20 min; at 40 min print the one JSON
    # line with an error marker and hard-exit.
    import threading

    def _watchdog():
        print(json.dumps({
            "metric": "608x608_inference_throughput", "value": 0.0,
            "unit": "images/sec/chip", "vs_baseline": 0.0,
            "error": "watchdog timeout: TPU tunnel unreachable or "
                     "compile stalled (see CLAUDE.md rule 9)"}),
            flush=True)
        os._exit(3)

    # BENCH_WATCHDOG_S: first-ever compiles of a changed graph can exceed
    # the 40-min default when the remote compiler is slow (observed
    # 2026-08-20: ~35 min for the K=128 leg); interactive runs can raise
    # the budget. The driver's end-of-round run hits the persistent
    # compile cache, so the default stays driver-safe.
    t = threading.Timer(float(os.environ.get("BENCH_WATCHDOG_S", 2400)),
                        _watchdog)
    t.daemon = True
    t.start()

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    md = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    try:
        r = bench(batch_size=bs, max_det=md, verbose=True)
        metric = "608x608_inference_throughput"
        if md != 128:
            metric += f"_maxdet{md}"
        out = {
            "metric": metric,
            "value": round(r["median"], 2),   # median of >=4 trials (r5)
            "unit": "images/sec/chip",
            "vs_baseline": round(r["median"] / 1000.0, 4),
            "max": round(r["max"], 2),
            "min": round(r["min"], 2),
            "spread_pct": r["spread_pct"],
            "trials": r["trials"],
        }
        if len(sys.argv) == 1:
            # driver mode: also measure the dense-scene capacity
            # (max_det=512, dota.py's detect default) so both product
            # configurations are on record — same JSON line, extra keys
            # (schema-compatible).
            r512 = bench(batch_size=bs, max_det=512, verbose=True)
            out["maxdet512_value"] = round(r512["median"], 2)
            out["maxdet512_max"] = round(r512["max"], 2)
            out["maxdet512_spread_pct"] = r512["spread_pct"]
            out["maxdet512_trials"] = r512["trials"]
    except Exception as e:
        # A dead axon relay deregisters the backend entirely (instant
        # RuntimeError) — the fast-failure sibling of the hang the watchdog
        # covers. Either way the driver must still get its one JSON line.
        import traceback
        traceback.print_exc()
        out = {"metric": "608x608_inference_throughput", "value": 0.0,
               "unit": "images/sec/chip", "vs_baseline": 0.0,
               "error": f"{type(e).__name__}: {e}"}
    print(json.dumps(out))
