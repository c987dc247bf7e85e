#!/usr/bin/env python
"""Training CLI.

Mirrors the reference train.py surface (SURVEY.md §2 "train CLI", §3.1):
build model from cfg, load .weights (full or backbone-only), SGD with
burn-in + step LR from the cfg [net] block, epoch loop with per-epoch eval,
results.txt row per epoch, last/best checkpoints (orbax) and .weights
export. ``--devices N`` turns on data-parallel training over an N-chip
mesh (psum over ICI).

Usage:
  python train.py --cfg cfg/yolov3-rotate-hrsc.cfg --data datacfg/hrsc2016.data \
      --weights weights/darknet53.conv.74.weights --epochs 100 --batch-size 8
"""

from __future__ import annotations

import argparse
import os
import time


def train(opt):
    from rotate_yolov3_tpu.utils.device import select_device
    select_device(getattr(opt, "device", ""))
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rotate_yolov3_tpu.config.hyp import Hyp
    from rotate_yolov3_tpu.config.parse import (load_classes, parse_data_cfg,
                                                parse_model_cfg)
    from rotate_yolov3_tpu.data.datasets import LoadImagesAndLabels
    from rotate_yolov3_tpu.detector import Detector
    from rotate_yolov3_tpu.eval.evaluator import (evaluate_dataset,
                                                  print_eval_table)
    from rotate_yolov3_tpu.models import (build_network, fuse_bn, init_params,
                                          load_weights_file,
                                          save_darknet_weights,
                                          save_torch_pt)
    from rotate_yolov3_tpu.parallel.mesh import (
        DATA_AXIS, make_mesh, make_parallel_train_step, replicate,
        shard_batch)
    from rotate_yolov3_tpu.train.schedule import (cosine_schedule,
                                                  darknet_schedule)
    from rotate_yolov3_tpu.train.trainer import (
        init_train_state, load_checkpoint, make_optimizer, make_train_step,
        save_checkpoint)

    data_cfg = parse_data_cfg(opt.data)
    names = load_classes(data_cfg["names"]) if "names" in data_cfg else []
    module_defs = parse_model_cfg(opt.cfg)
    spec = build_network(module_defs, img_size=opt.img_size)
    net = spec.hyperparams()
    hyp = Hyp(rotated_ignore=opt.rotated_ignore)

    params, state = init_params(spec, jax.random.PRNGKey(opt.seed))
    if opt.weights:
        params, state, _ = load_weights_file(spec, params, state,
                                             opt.weights)
        print(f"loaded weights from {opt.weights}")

    # dataset
    dataset = LoadImagesAndLabels(
        data_cfg["train"], img_size=spec.img_size,
        batch_size=opt.batch_size, augment=not opt.no_augment, hyp=hyp,
        max_gt=opt.max_gt, seed=opt.seed,
        cache_images=opt.cache_images, workers=opt.workers)
    steps_per_epoch = len(dataset)
    if steps_per_epoch == 0:
        raise ValueError("dataset smaller than one batch")

    # optimizer from cfg [net] hyperparams (reference two-tier config)
    base_lr = opt.lr if opt.lr else float(net.get("learning_rate", 1e-3))
    burn_in = int(net.get("burn_in", 1000)) if opt.burn_in is None \
        else opt.burn_in
    if opt.cosine:
        sched = cosine_schedule(base_lr, steps_per_epoch * opt.epochs,
                                burn_in)
    else:
        steps = net.get("steps", (400000, 450000))
        scales = net.get("scales", (0.1, 0.1))
        sched = darknet_schedule(base_lr, burn_in, steps, scales)
    optimizer = make_optimizer(sched, momentum=float(net.get("momentum", .9)),
                               weight_decay=float(net.get("decay", 5e-4)))
    ts = init_train_state(spec, params, state, optimizer)

    start_epoch = 0
    ckpt_dir = os.path.join(opt.out_dir, "ckpt")
    if opt.resume:
        ts, at = load_checkpoint(ckpt_dir, ts)
        start_epoch = at
        print(f"resumed from epoch {at}")

    # train step: single device or DP mesh
    step_kwargs = dict(
        hyp=hyp, compute_dtype=jnp.bfloat16 if opt.bf16 else jnp.float32,
        device_aug=opt.device_aug, aug_seed=opt.seed)
    if opt.device_aug:
        # host loader stops augmenting; the train step does it on device
        dataset.augment = False

    mesh = None
    if opt.devices and opt.devices > 1:
        mesh = make_mesh(opt.devices)
        ts = replicate(mesh, ts)

        def put(b):
            return shard_batch(mesh, *b)
    else:
        def put(b):
            return tuple(jnp.asarray(x) for x in b)

    # One step function per net-input size. Multi-scale training (the
    # reference's [yolo] random=1 behavior) draws a size every
    # ~ms_interval batches from 0.67x..1.5x in 32px steps — each size
    # compiles once (jit cache).
    import dataclasses as _dc

    _step_cache = {}

    def step_fn_for(size):
        if size not in _step_cache:
            sspec = _dc.replace(spec, img_size=size)
            if mesh is not None:
                fn = make_parallel_train_step(
                    make_train_step(sspec, optimizer, axis_name=DATA_AXIS,
                                    **step_kwargs), mesh)
            else:
                # donate the train state: params/momentum/BN buffers are
                # rewritten every step — in-place reuse instead of a
                # fresh ~3x-param-bytes allocation + copy per step
                fn = jax.jit(make_train_step(sspec, optimizer,
                                             **step_kwargs),
                             donate_argnums=(0,))
            _step_cache[size] = fn
        return _step_cache[size]

    if opt.multi_scale:
        base = spec.img_size
        scale_sizes = sorted({max(32, (int(base * s) // 32) * 32)
                              for s in np.linspace(0.67, 1.5, 8)})
        # reference random=1 semantics: a new size draw every ~10 batches
        # (not per epoch) — the dataset draws deterministically per batch
        # index and the loop keys the jitted step off the batch shape
        dataset.set_multi_scale(scale_sizes, interval=opt.ms_interval)
        print(f"multi-scale sizes: {scale_sizes} "
              f"(every {opt.ms_interval} batches)")

    os.makedirs(opt.out_dir, exist_ok=True)
    results_path = os.path.join(opt.out_dir, "results.txt")
    from rotate_yolov3_tpu.utils.metrics_writer import MetricsWriter
    metrics_writer = MetricsWriter(opt.out_dir,
                                   tensorboard=not opt.no_tensorboard)
    best_map = -1.0

    # one Detector reused across epochs so the eval graph compiles once
    eval_det = None
    if not opt.no_eval and "valid" in data_cfg and \
            os.path.exists(data_cfg["valid"]):
        # bake_params=False: this Detector gets fresh params every epoch
        # (refresh_params), and the weight-baked serving jit would pay a
        # remote recompile per epoch — keep the params-as-argument graph
        # that compiles once
        eval_det = Detector(opt.cfg, img_size=spec.img_size,
                            conf_thres=opt.conf_thres,
                            nms_thres=opt.nms_thres,
                            bake_params=False)

    for epoch in range(start_epoch, opt.epochs):
        dataset.set_epoch(epoch)
        t0 = time.time()
        agg = {}
        n_steps = 0
        for batch in dataset:
            # per-size jitted step, keyed off the batch shape (multi-scale
            # draws a new size every ms_interval batches; one compile/size)
            step_fn = step_fn_for(int(batch[0].shape[1]))
            imgs, tgts, valid = put(batch)
            ts, metrics = step_fn(ts, imgs, tgts, valid)
            n_steps += 1
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + float(v)
        agg = {k: v / max(n_steps, 1) for k, v in agg.items()}
        dt = time.time() - t0
        imgs_per_s = n_steps * opt.batch_size / max(dt, 1e-9)
        print(f"epoch {epoch}: " +
              " ".join(f"{k}={v:.4f}" for k, v in sorted(agg.items())) +
              f" ({imgs_per_s:.1f} img/s)")

        # per-epoch eval (reference train.py calls test.test each epoch)
        mp = mr = mAP = 0.0
        if eval_det is not None:
            # refresh through the FULL fusion pipeline (BN fold + input-
            # scale fold + head permutation): assigning raw fuse_bn output
            # to .fused_params skips the folds the jitted inference graph
            # was built around and silently corrupts eval
            eval_det.refresh_params(jax.device_get(ts.params),
                                    jax.device_get(ts.state))
            result = evaluate_dataset(eval_det, data_cfg["valid"],
                                      batch_size=opt.batch_size,
                                      names=names,
                                      max_images=opt.eval_max_images)
            mp, mr, mAP = result["mp"], result["mr"], result["map"]
            print_eval_table(result)

        with open(results_path, "a") as f:
            f.write(f"{epoch} {agg.get('xy', 0):.5f} {agg.get('obj', 0):.5f} "
                    f"{agg.get('cls', 0):.5f} {agg.get('angle', 0):.5f} "
                    f"{agg.get('total', 0):.5f} {mp:.5f} {mr:.5f} "
                    f"{mAP:.5f}\n")
        metrics_writer.write(epoch, {**agg, "P": mp, "R": mr, "mAP": mAP,
                                     "img_per_s": imgs_per_s,
                                     "lr": float(sched(ts.step))})

        host_ts = jax.device_get(ts)
        save_checkpoint(ckpt_dir, host_ts, step=epoch + 1)
        # both interchange flavors, like the reference: last/best .pt
        # (torch pickle, its primary format) + .weights (darknet binary)
        save_darknet_weights(spec, host_ts.params, host_ts.state,
                             os.path.join(opt.out_dir, "last.weights"),
                             seen=int(host_ts.step) * opt.batch_size)
        save_torch_pt(spec, host_ts.params, host_ts.state,
                      os.path.join(opt.out_dir, "last.pt"), epoch=epoch)
        if mAP > best_map:
            best_map = mAP
            save_darknet_weights(spec, host_ts.params, host_ts.state,
                                 os.path.join(opt.out_dir, "best.weights"),
                                 seen=int(host_ts.step) * opt.batch_size)
            save_torch_pt(spec, host_ts.params, host_ts.state,
                          os.path.join(opt.out_dir, "best.pt"), epoch=epoch)
    metrics_writer.close()
    return best_map


def make_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cfg", type=str, required=True)
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--weights", type=str, default="",
                   help="initial .weights (full or backbone-only) or .pt")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--img-size", type=int, default=None)
    p.add_argument("--max-gt", type=int, default=64)
    p.add_argument("--lr", type=float, default=None,
                   help="override cfg learning_rate")
    p.add_argument("--burn-in", type=int, default=None)
    p.add_argument("--cosine", action="store_true")
    p.add_argument("--devices", type=int, default=0,
                   help="data-parallel over N devices (0 = single)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--rotated-ignore", action="store_true",
                   help="exact rotated skew-IoU for the objectness ignore "
                        "region instead of darknet's axis-aligned box_iou "
                        "(accuracy experiment; ~13x slower train step)")
    p.add_argument("--device-aug", action="store_true",
                   help="fuse mosaic/rotation/flip/HSV augmentation into "
                        "the jitted train step (on-device)")
    p.add_argument("--multi-scale", action="store_true",
                   help="vary net input size every --ms-interval batches "
                        "(0.67x-1.5x, /32) — the reference's random=1 cfg "
                        "behavior")
    p.add_argument("--ms-interval", type=int, default=10,
                   help="batches between multi-scale size draws")
    p.add_argument("--cache-images", choices=["", "ram", "disk"], default="",
                   help="cache decoded images in RAM or as .npy sidecars "
                        "(host decode dominates epochs on slow hosts)")
    p.add_argument("--workers", type=int, default=1,
                   help="host prefetch worker threads")
    p.add_argument("--no-eval", action="store_true")
    p.add_argument("--no-tensorboard", action="store_true",
                   help="disable TensorBoard event files (metrics.csv/"
                        ".jsonl are always written)")
    p.add_argument("--eval-max-images", type=int, default=None)
    p.add_argument("--conf-thres", type=float, default=0.1)
    p.add_argument("--nms-thres", type=float, default=0.4)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--out-dir", type=str, default="weights")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--device", type=str, default="",
                   help="jax platform override (cpu/tpu)")
    return p


if __name__ == "__main__":
    train(make_parser().parse_args())
