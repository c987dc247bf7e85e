#!/usr/bin/env python
"""Train-step batch-scaling curve (VERDICT r3 task #3).

Measures the PRODUCT train step (trainer.make_train_step — grad + SGD/
momentum + BN merge, donated state) at batch sizes 8/16/32/64, 608x608
bf16, MAX_GT=64, with the honest scan protocol (K steps inside one jitted
lax.scan, fresh stacks per trial, scalar-fetch sync — bench.py docstring).

Context: r2 measured bs=8 -> 168 img/s and bs=16 -> 168 img/s (flat), while
the r3 conv-underfill bound proof predicts throughput should RISE with
batch (docs/PERF.md). This script decides which claim is wrong, post-r3,
on the same protocol for every point. An OOM at a given batch is recorded
as a result, not an error (v5e has ~16 GB HBM; bwd at bs=64/608^2 may not
fit without remat).

Usage: python _scratch/batch_scaling.py [bs ...]   (default: 8 16 32 64)
       python _scratch/batch_scaling.py pieces <bs>   (stage ladder at bs:
           inference-mode fwd / train-mode fwd / fwd+bwd / full step —
           localizes which stage anti-scales with batch)
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

from rotate_yolov3_tpu.config.hyp import Hyp
from rotate_yolov3_tpu.config.parse import parse_model_cfg
from rotate_yolov3_tpu.models.darknet import build_network, init_params
from rotate_yolov3_tpu.train.schedule import darknet_schedule
from rotate_yolov3_tpu.train.trainer import (init_train_state, make_optimizer,
                                             make_train_step)

S, MAX_GT, K, TRIALS = 608, 64, 4, 2
CFG = "/root/repo/cfg/yolov3-rotate-hrsc.cfg"


def fresh_inputs(seed, b):
    r = np.random.default_rng(seed)
    imgs = r.integers(0, 255, (K, b, S, S, 3), dtype=np.uint8)
    n_live = 20
    t = np.zeros((K, b, MAX_GT, 6), np.float32)
    t[..., :n_live, 1:3] = r.uniform(0.2, 0.8, (K, b, n_live, 2))
    t[..., :n_live, 3:5] = r.uniform(0.03, 0.2, (K, b, n_live, 2))
    t[..., :n_live, 5] = r.uniform(-1.5, 1.5, (K, b, n_live))
    v = np.zeros((K, b, MAX_GT), bool)
    v[..., :n_live] = True
    dev = jax.device_put((jnp.asarray(imgs), jnp.asarray(t), jnp.asarray(v)))
    float(jnp.sum(dev[1]) + jnp.sum(dev[0][0, 0, 0, 0, :]) + jnp.sum(dev[2]))
    return dev


def measure(b):
    spec = build_network(parse_model_cfg(CFG), img_size=S)
    params, state = init_params(spec, jax.random.PRNGKey(0))
    hyp = Hyp()
    optimizer = make_optimizer(darknet_schedule(1e-4))
    ts = init_train_state(spec, params, state, optimizer)
    step_fn = make_train_step(spec, optimizer, hyp=hyp,
                              compute_dtype=jnp.bfloat16)

    def loop(ts, imgs, tgts, valid):
        def body(c, xs):
            c, comp = step_fn(c, *xs)
            return c, comp["total"]
        ts, outs = jax.lax.scan(body, ts, (imgs, tgts, valid))
        return ts, jnp.sum(outs)

    jfn = jax.jit(loop, donate_argnums=(0,))
    try:
        ts, s = jfn(ts, *fresh_inputs(0, b))
        jax.block_until_ready(s)
        best = 1e9
        for trial in range(TRIALS):
            stacks = fresh_inputs(trial + 1, b)
            t0 = time.perf_counter()
            ts, s = jfn(ts, *stacks)
            float(s)
            best = min(best, time.perf_counter() - t0)
        ms = best / K * 1e3
        print(f"bs={b:3d}  {ms:8.2f} ms/step  {b / (best / K):7.1f} img/s",
              flush=True)
    except Exception as e:  # OOM etc. — a result, record it
        msg = str(e).splitlines()[0][:160]
        print(f"bs={b:3d}  FAILED: {msg}", flush=True)


def pieces(b):
    """Cumulative stage ladder at batch ``b`` (same scan protocol)."""
    import jax.numpy as jnp

    from rotate_yolov3_tpu.models.darknet import apply_fused, apply_network, fuse_bn
    from rotate_yolov3_tpu.train.loss import compute_loss

    spec = build_network(parse_model_cfg(CFG), img_size=S)
    params, state = init_params(spec, jax.random.PRNGKey(0))
    hyp = Hyp()
    fused = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                         fuse_bn(spec, params, state))

    def run(name, fn, carry):
        def loop(c, imgs, tgts, valid):
            def body(c, xs):
                return fn(c, *xs)
            c, outs = jax.lax.scan(body, c, (imgs, tgts, valid))
            return c, jnp.sum(outs)

        jfn = jax.jit(loop)
        import time as _t
        c, s = jfn(carry, *fresh_inputs(0, b))
        jax.block_until_ready(s)
        best = 1e9
        for trial in range(TRIALS):
            stacks = fresh_inputs(trial + 1, b)
            t0 = _t.perf_counter()
            c, s = jfn(carry, *stacks)
            float(s)
            best = min(best, _t.perf_counter() - t0)
        ms = best / K * 1e3
        print(f"{name:12s} bs={b:3d}  {ms:8.2f} ms/step  "
              f"{b / (best / K):7.1f} img/s", flush=True)

    def infer_fwd(c, imgs, tgts, valid):
        x = imgs.astype(jnp.bfloat16) * (1.0 / 255.0)
        heads = apply_fused(spec, fused, x)
        return c, sum(jnp.sum(h.astype(jnp.float32)) for h in heads)
    run("infer_fwd", infer_fwd, jnp.float32(0))

    def train_fwd(c, imgs, tgts, valid):
        x = imgs.astype(jnp.bfloat16) * (1.0 / 255.0)
        heads, _ = apply_network(spec, params, state, x, train=True)
        return c, sum(jnp.sum(h.astype(jnp.float32)) for h in heads)
    run("train_fwd", train_fwd, jnp.float32(0))

    def loss_fwd(c, imgs, tgts, valid):
        x = imgs.astype(jnp.bfloat16) * (1.0 / 255.0)
        heads, _ = apply_network(spec, params, state, x, train=True)
        heads = [h.astype(jnp.float32) for h in heads]
        total, _ = compute_loss(heads, tgts, valid, spec.yolo_specs, S, hyp)
        return c, total
    run("loss_fwd", loss_fwd, jnp.float32(0))

    def loss_grad(c, imgs, tgts, valid):
        def lfn(p):
            x = imgs.astype(jnp.bfloat16) * (1.0 / 255.0)
            heads, _ = apply_network(spec, p, state, x, train=True)
            heads = [h.astype(jnp.float32) for h in heads]
            total, _ = compute_loss(heads, tgts, valid, spec.yolo_specs,
                                    S, hyp)
            return total
        v, g = jax.value_and_grad(lfn)(params)
        return c, v + 0.0 * sum(jnp.sum(x) for x in jax.tree.leaves(g))
    run("loss_grad", loss_grad, jnp.float32(0))


if __name__ == "__main__":
    if sys.argv[1:2] == ["pieces"]:
        pieces(int(sys.argv[2]) if len(sys.argv) > 2 else 64)
        sys.exit(0)
    sizes = [int(a) for a in sys.argv[1:]] or [8, 16, 32, 64]
    for b in sizes:
        measure(b)
