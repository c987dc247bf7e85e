#!/usr/bin/env python
"""Training-step stage decomposition (VERDICT r2 task #3).

Times a ladder of cumulative programs at the BASELINE config #4 shape
(bs=8, 608x608, bf16 compute, MAX_GT=64) with the honest scan protocol
(K steps inside one jitted lax.scan, fresh input stacks per trial,
scalar-fetch sync — see bench.py docstring):

  fwd        train-mode forward only (BN batch stats), heads summed
  fwd_bwd    d(sum of heads)/d(params) — conv fwd+bwd without loss math
  loss_fwd   full loss (assignment + 6 terms + ignore scan), NO grad
  loss_grad  value_and_grad of the full loss (no optimizer)
  step       the product train step (grad + SGD/momentum + BN merge)

plus isolated micro-programs for the non-conv stages (assignment, ignore
scan, loss-given-heads fwd) so the conv-vs-bookkeeping split is direct.

Usage: python _scratch/train_decomp.py [program ...]   (default: all)
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
from rotate_yolov3_tpu.models.darknet import (apply_network, build_network,
                                              init_params)
from rotate_yolov3_tpu.train.assign import build_targets
from rotate_yolov3_tpu.train.loss import compute_loss, objectness_ignore
from rotate_yolov3_tpu.train.schedule import darknet_schedule
from rotate_yolov3_tpu.train.trainer import (init_train_state, make_optimizer,
                                             make_train_step)

B, S, MAX_GT, K, TRIALS = 8, 608, 64, 4, 2
CFG = "/root/repo/cfg/yolov3-rotate-hrsc.cfg"


def fresh_inputs(seed):
    r = np.random.default_rng(seed)
    imgs = r.integers(0, 255, (K, B, S, S, 3), dtype=np.uint8)
    # plausible GT: 20 live boxes/img, centered sizes, radians
    n_live = 20
    t = np.zeros((K, B, MAX_GT, 6), np.float32)
    t[..., :n_live, 0] = 0
    t[..., :n_live, 1:3] = r.uniform(0.2, 0.8, (K, B, n_live, 2))
    t[..., :n_live, 3:5] = r.uniform(0.03, 0.2, (K, B, n_live, 2))
    t[..., :n_live, 5] = r.uniform(-1.5, 1.5, (K, B, n_live))
    v = np.zeros((K, B, MAX_GT), bool)
    v[..., :n_live] = True
    dev = jax.device_put((jnp.asarray(imgs), jnp.asarray(t), jnp.asarray(v)))
    # force ALL three transfers to complete before the trial timer starts —
    # the fetched scalar must depend on the ~35 MB image stack and the
    # valid mask too, not just the targets (advisor r3 finding)
    float(jnp.sum(dev[1]) + jnp.sum(dev[0][0, 0, 0, 0, :])
          + jnp.sum(dev[2]))
    return dev


def main(which):
    spec = build_network(parse_model_cfg(CFG), img_size=S)
    params, state = init_params(spec, jax.random.PRNGKey(0))
    hyp = Hyp()
    dt = jnp.bfloat16
    yolo_specs = spec.yolo_specs

    imgs0, tg0, v0 = fresh_inputs(0)

    def run(name, fn, carry=None, donate=False, scan_imgs=True):
        """fn(carry, imgs, tgts, valid) -> (carry, scalar); scanned K deep.

        ``scan_imgs=False`` drops the (unused) ~35 MB image stack from the
        scanned xs entirely — the r3 harness scanned it anyway, inflating
        the isolated non-conv stage numbers by ~7 ms/step (advisor r3
        finding; docs/PERF.md documents the misattribution it caused).
        ``fn`` still takes the imgs argument (as None) for signature
        uniformity."""
        def loop(c, *stacks):
            def body(c, xs):
                if scan_imgs:
                    return fn(c, *xs)
                return fn(c, None, *xs)
            c, outs = jax.lax.scan(body, c, stacks)
            return c, jnp.sum(outs)

        jfn = jax.jit(loop, donate_argnums=(0,) if donate else ())
        c0 = carry
        c, s = (jfn(c0, imgs0, tg0, v0) if scan_imgs
                else jfn(c0, tg0, v0))
        jax.block_until_ready(s)
        best = 1e9
        for trial in range(TRIALS):
            ist, tst, vst = fresh_inputs(trial + 1)
            cin = c if donate else c0
            t0 = time.perf_counter()
            c, s = (jfn(cin, ist, tst, vst) if scan_imgs
                    else jfn(cin, tst, vst))
            float(s)
            dt_ = time.perf_counter() - t0
            best = min(best, dt_)
        ms = best / K * 1e3
        print(f"{name:12s} {ms:8.2f} ms/step  {B / (best / K):7.1f} img/s",
              flush=True)

    if "fwd" in which:
        def fwd(c, imgs, tgts, valid):
            x = (imgs.astype(jnp.float32) / 255.0).astype(dt)
            heads, _ = apply_network(spec, params, state, x, train=True)
            return c, sum(jnp.sum(h.astype(jnp.float32)) for h in heads)
        run("fwd", fwd, carry=jnp.float32(0))

    if "fwd_bwd" in which:
        def f(p, imgs):
            x = (imgs.astype(jnp.float32) / 255.0).astype(dt)
            heads, _ = apply_network(spec, p, state, x, train=True)
            return sum(jnp.sum(h.astype(jnp.float32)) for h in heads)

        def fwd_bwd(c, imgs, tgts, valid):
            g = jax.grad(f)(params, imgs)
            return c, sum(jnp.sum(x) for x in jax.tree.leaves(g))
        run("fwd_bwd", fwd_bwd, carry=jnp.float32(0))

    if "loss_fwd" in which:
        def lf(c, imgs, tgts, valid):
            x = (imgs.astype(jnp.float32) / 255.0).astype(dt)
            heads, _ = apply_network(spec, params, state, x, train=True)
            heads = [h.astype(jnp.float32) for h in heads]
            total, _ = compute_loss(heads, tgts, valid, yolo_specs, S, hyp)
            return c, total
        run("loss_fwd", lf, carry=jnp.float32(0))

    if "loss_grad" in which:
        def lfn(p, imgs, tgts, valid):
            x = (imgs.astype(jnp.float32) / 255.0).astype(dt)
            heads, _ = apply_network(spec, p, state, x, train=True)
            heads = [h.astype(jnp.float32) for h in heads]
            total, _ = compute_loss(heads, tgts, valid, yolo_specs, S, hyp)
            return total

        def lg(c, imgs, tgts, valid):
            v, g = jax.value_and_grad(lfn)(params, imgs, tgts, valid)
            return c, v + 0.0 * sum(jnp.sum(x) for x in jax.tree.leaves(g))
        run("loss_grad", lg, carry=jnp.float32(0))

    if "step" in which:
        optimizer = make_optimizer(darknet_schedule(1e-4))
        ts = init_train_state(spec, params, state, optimizer)
        step_fn = make_train_step(spec, optimizer, hyp=hyp, compute_dtype=dt)

        def st(ts, imgs, tgts, valid):
            ts, comp = step_fn(ts, imgs, tgts, valid)
            return ts, comp["total"]
        run("step", st, carry=ts, donate=True)

    # ---- isolated non-conv stages (given random head maps) -----------------
    if "pieces" in which:
        key = jax.random.PRNGKey(1)
        heads0 = [jax.random.normal(
            key, (B, S // sp.stride, S // sp.stride, sp.na * sp.no),
            jnp.float32) * 0.5 for sp in yolo_specs]

        def assign_only(c, imgs, tgts, valid):
            tg = build_targets(tgts, valid, yolo_specs, S, hyp.iou_t)
            return c, sum(jnp.sum(t.txy) + jnp.sum(t.assigned)
                          for t in tg)
        run("assign", assign_only, carry=jnp.float32(0), scan_imgs=False)

        def ignore_only(c, imgs, tgts, valid):
            tg = build_targets(tgts, valid, yolo_specs, S, hyp.iou_t)
            tot = 0.0
            for h, t, sp in zip(heads0, tg, yolo_specs):
                ig = objectness_ignore(h, t.tbox_abs, sp, rotated=False)
                tot = tot + jnp.sum(ig.astype(jnp.float32))
            return c, tot
        run("assign+ign", ignore_only, carry=jnp.float32(0),
            scan_imgs=False)

        def loss_only(c, imgs, tgts, valid):
            total, _ = compute_loss(heads0, tgts, valid, yolo_specs, S, hyp)
            return c, total
        run("loss(heads)", loss_only, carry=jnp.float32(0),
            scan_imgs=False)


if __name__ == "__main__":
    which = sys.argv[1:] or ["fwd", "fwd_bwd", "loss_fwd", "loss_grad",
                             "step", "pieces"]
    main(which)
