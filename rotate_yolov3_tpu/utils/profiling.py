"""Profiling / timing / model-info utilities.

Upgrades the reference's tqdm-bars-and-prints observability (SURVEY.md §5
"tracing / profiling"): a block_until_ready timing harness for steady-state
throughput, jax.profiler trace capture (Perfetto-compatible), and a
model-info printout in the spirit of ``torch_utils.model_info``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import numpy as np


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 3
            ) -> Dict[str, float]:
    """Steady-state wall time of a device function (seconds/call).

    Blocks on the first output leaf; returns mean/std/min over iters.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    t = np.asarray(times)
    return {"mean_s": float(t.mean()), "std_s": float(t.std()),
            "min_s": float(t.min()), "iters": iters}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """Capture a jax.profiler trace (view with Perfetto / TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def model_info(spec, params) -> str:
    """Human-readable layer table + parameter count (reference
    ``model_info`` role)."""
    from ..models.darknet import ConvSpec, count_params

    lines = [f"{'idx':>4} {'type':>12} {'out_c':>6} {'size':>5} "
             f"{'stride':>6} {'params':>10}"]
    total = 0
    for layer in spec.layers:
        t = type(layer).__name__.replace("Spec", "").lower()
        if isinstance(layer, ConvSpec):
            n = layer.size * layer.size * layer.in_c * layer.out_c
            n += 2 * layer.out_c if layer.bn else layer.out_c
            total += n
            lines.append(f"{layer.index:>4} {t:>12} {layer.out_c:>6} "
                         f"{layer.size:>5} {layer.stride:>6} {n:>10}")
        else:
            lines.append(f"{layer.index:>4} {t:>12}")
    lines.append(f"total params: {total:,} "
                 f"(pytree: {count_params(params):,})")
    return "\n".join(lines)


def flops_per_image(spec) -> int:
    """Conv MAC count for one image (2 FLOPs per MAC) — MXU utilisation
    denominator for the bench."""
    from ..models.darknet import ConvSpec

    total = 0
    size = spec.img_size
    strides = {}
    cur = 1
    for layer in spec.layers:
        from ..models.darknet import (MaxPoolSpec, RouteSpec, ShortcutSpec,
                                      UpsampleSpec)

        if isinstance(layer, ConvSpec):
            cur_stride = strides.get(layer.index - 1, 1) * layer.stride \
                if layer.index > 0 else layer.stride
            strides[layer.index] = cur_stride
            hw = (size // cur_stride) ** 2
            total += (layer.size * layer.size * layer.in_c
                      * layer.out_c * hw)
        elif isinstance(layer, (MaxPoolSpec,)):
            strides[layer.index] = strides.get(layer.index - 1, 1) \
                * layer.stride
        elif isinstance(layer, UpsampleSpec):
            strides[layer.index] = strides.get(layer.index - 1, 1) \
                // layer.stride
        elif isinstance(layer, RouteSpec):
            strides[layer.index] = strides[layer.layers[0]]
        else:
            strides[layer.index] = strides.get(layer.index - 1, 1)
    return 2 * total
