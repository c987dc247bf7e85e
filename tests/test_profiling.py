"""Profiling utils + architecture-fidelity constants.

The full cfg must reproduce yolov3's published figures: ~61.6M params
(nc=1 rotated heads) and ~140.7 GFLOP at 608^2 — a strong end-to-end check
that the cfg assets and builder arithmetic match the real architecture.
"""

import os

import jax
import jax.numpy as jnp

from rotate_yolov3_tpu.config.parse import parse_model_cfg
from rotate_yolov3_tpu.models import build_network, init_params
from rotate_yolov3_tpu.utils.device import device_info, select_device
from rotate_yolov3_tpu.utils.profiling import (flops_per_image, model_info,
                                               time_fn)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_full_model_flops_and_params_match_yolov3():
    spec = build_network(
        parse_model_cfg(os.path.join(ROOT, "cfg/yolov3-rotate-hrsc.cfg")),
        img_size=608)
    g = flops_per_image(spec)
    assert 135e9 < g < 145e9          # yolov3@608 is ~140.7 BFLOPs
    params, _ = init_params(spec, jax.random.PRNGKey(0))
    info = model_info(spec, params)
    assert "61,717,594" in info       # ~61.6M + rotated-head deltas


def test_time_fn_and_device_info():
    r = time_fn(jax.jit(lambda x: x * 2), jnp.ones((64, 64)),
                iters=3, warmup=1)
    assert r["min_s"] > 0 and r["mean_s"] >= r["min_s"]
    assert "backend=cpu" in device_info()
    assert select_device("") == "cpu"   # no-op keeps current backend
