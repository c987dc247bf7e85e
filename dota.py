#!/usr/bin/env python
"""DOTA pipeline CLI: tile splitting, batched per-tile detection,
cross-tile merge, Task-1 evaluation.

Covers the reference's DOTA_devkit workflow (SURVEY.md §3.5; BASELINE
config #3 'batched DOTA inference: tile cropping + per-tile detect +
cross-tile rotated NMS merge') as subcommands:

  python dota.py split  --images DIR --labels DIR --out DIR [--subsize 1024 --gap 200]
  python dota.py detect --cfg CFG --weights W --tiles DIR --out DIR [--batch-size 8]
  python dota.py merge  --dets DIR --out DIR --names datacfg/dota.names
  python dota.py eval   --dets DIR --gt DIR --names datacfg/dota.names
"""

from __future__ import annotations

import argparse
import json
import os


def cmd_split(opt):
    from rotate_yolov3_tpu.data.dota.img_split import split_dataset

    written = split_dataset(opt.images, opt.labels, opt.out,
                            subsize=opt.subsize, gap=opt.gap,
                            keep_frac=opt.keep_frac)
    print(f"wrote {len(written)} tiles under {opt.out}")


def cmd_detect(opt):
    from rotate_yolov3_tpu.utils.device import select_device
    select_device(getattr(opt, "device", ""))
    import numpy as np
    import jax.numpy as jnp

    from rotate_yolov3_tpu.data.loaders import LoadImages, batched
    from rotate_yolov3_tpu.detector import Detector, detections_to_numpy
    from rotate_yolov3_tpu.ops.boxes import scale_coords_rotated

    if bool(opt.tiles) == bool(opt.source):
        raise SystemExit("pass exactly one of --tiles (pre-split, host "
                         "pipeline) or --source (full images, on-device "
                         "tile pipeline)")
    det = Detector(opt.cfg, weights=opt.weights or None,
                   img_size=opt.img_size, conf_thres=opt.conf_thres,
                   nms_thres=opt.nms_thres, max_det=opt.max_det,
                   devices=opt.devices,
                   compute_dtype=jnp.bfloat16 if opt.bf16 else jnp.float32,
                   approx_top_k=True if opt.approx_topk else False)
    if opt.source:
        return _detect_device_tiles(opt, det)
    os.makedirs(opt.out, exist_ok=True)
    loader = LoadImages(opt.tiles, img_size=det.img_size)
    n = 0
    for items, n_real in batched(iter(loader), opt.batch_size):
        imgs = np.stack([it[1] for it in items])
        dets, mask = det(imgs)
        per_image = detections_to_numpy(dets, mask)
        for (path, _, _, ratio, pad), d in zip(items[:n_real],
                                               per_image[:n_real]):
            if len(d):
                d = np.asarray(scale_coords_rotated(jnp.asarray(d), ratio,
                                                    pad))
            stem = os.path.splitext(os.path.basename(path))[0]
            np.savetxt(os.path.join(opt.out, stem + ".txt"), d, fmt="%.4f")
            n += 1
    print(f"detected over {n} tiles -> {opt.out}")


def _detect_device_tiles(opt, det):
    """``--source``: full-resolution images through the ON-DEVICE tile
    pipeline (tile grid + letterbox + detection + cross-tile merge in one
    jitted program per source-shape bucket — data.dota.device_tiles), no
    pre-split tiles on disk. Writes devkit Task-1 files directly."""
    import time

    import cv2
    import numpy as np

    from rotate_yolov3_tpu.config.parse import load_classes
    from rotate_yolov3_tpu.data.dota.device_tiles import DeviceTilePipeline
    from rotate_yolov3_tpu.data.dota.result_merge import write_task1_results

    pipe = DeviceTilePipeline(det, subsize=opt.subsize, gap=opt.gap,
                              merge_nms_thres=opt.merge_nms_thres,
                              max_merged=opt.max_merged)
    names = load_classes(opt.names) if opt.names else [
        str(i) for i in range(det.spec.yolo_specs[0].num_classes)]
    exts = (".png", ".jpg", ".jpeg", ".tif", ".bmp")
    merged = {}
    n_tiles = 0
    t0 = time.perf_counter()
    for fname in sorted(os.listdir(opt.source)):
        stem, ext = os.path.splitext(fname)
        if ext.lower() not in exts:
            continue
        img0 = cv2.imread(os.path.join(opt.source, fname))
        if img0 is None:
            continue
        img = img0[:, :, ::-1]          # BGR -> RGB (net-input convention)
        dets, mask = pipe(img)
        merged[stem] = dets[mask]
        n_tiles += pipe.num_tiles(*img.shape[:2])
    dt = time.perf_counter() - t0
    write_task1_results(merged, names, opt.out)
    total = sum(len(v) for v in merged.values())
    print(f"on-device tile pipeline: {len(merged)} images / {n_tiles} "
          f"tiles in {dt:.1f}s (incl. compiles), {total} merged "
          f"detections -> {opt.out}")


def cmd_merge(opt):
    import numpy as np

    from rotate_yolov3_tpu.config.parse import load_classes
    from rotate_yolov3_tpu.data.dota.result_merge import (
        merge_tile_detections, write_task1_results)

    names = load_classes(opt.names)
    tile_dets = {}
    for f in sorted(os.listdir(opt.dets)):
        if not f.endswith(".txt"):
            continue
        path = os.path.join(opt.dets, f)
        if os.path.getsize(path) == 0:
            arr = np.zeros((0, 7), np.float32)
        else:
            arr = np.loadtxt(path, ndmin=2)
            if arr.size == 0:
                arr = np.zeros((0, 7), np.float32)
        tile_dets[os.path.splitext(f)[0]] = arr.astype(np.float32)
    merged = merge_tile_detections(tile_dets, nms_thres=opt.nms_thres)
    write_task1_results(merged, names, opt.out)
    total = sum(len(v) for v in merged.values())
    print(f"merged {len(tile_dets)} tiles -> {len(merged)} images, "
          f"{total} detections -> {opt.out}")


def cmd_eval(opt):
    from rotate_yolov3_tpu.config.parse import load_classes
    from rotate_yolov3_tpu.data.dota.evaluation import evaluate_task1

    names = load_classes(opt.names)
    result = evaluate_task1(opt.dets, opt.gt, names, iou_thr=opt.iou_thres,
                            method=opt.ap_method)
    for row in result["per_class"]:
        print(f"{row['name']:>20} AP={row['ap']:.4f} (n_gt={row['n_gt']})")
    print(f"{'mAP':>20} {result['map']:.4f}")
    if opt.json:
        with open(opt.json, "w") as f:
            json.dump(result, f, indent=1)


def make_parser():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("split")
    ps.add_argument("--images", required=True)
    ps.add_argument("--labels", required=True)
    ps.add_argument("--out", required=True)
    ps.add_argument("--subsize", type=int, default=1024)
    ps.add_argument("--gap", type=int, default=200)
    ps.add_argument("--keep-frac", type=float, default=0.7)
    ps.set_defaults(fn=cmd_split)

    pd = sub.add_parser("detect")
    pd.add_argument("--cfg", required=True)
    pd.add_argument("--weights", default="")
    pd.add_argument("--tiles", default="",
                    help="pre-split tile dir (host pipeline; per-tile txt "
                         "outputs for dota.py merge)")
    pd.add_argument("--source", default="",
                    help="FULL-resolution image dir: on-device tile "
                         "pipeline (tile+detect+merge in one jitted "
                         "program), writes Task-1 files directly")
    pd.add_argument("--subsize", type=int, default=1024)
    pd.add_argument("--gap", type=int, default=200)
    pd.add_argument("--merge-nms-thres", type=float, default=0.3)
    pd.add_argument("--max-merged", type=int, default=1024)
    pd.add_argument("--names", default="",
                    help="class-names file for --source Task-1 output")
    pd.add_argument("--out", required=True)
    pd.add_argument("--img-size", type=int, default=None)
    pd.add_argument("--batch-size", type=int, default=8)
    pd.add_argument("--conf-thres", type=float, default=0.1)
    pd.add_argument("--nms-thres", type=float, default=0.4)
    pd.add_argument("--max-det", type=int, default=512)
    pd.add_argument("--devices", type=int, default=0,
                    help="shard tile batches over N devices (0 = single)")
    pd.add_argument("--approx-topk", action="store_true",
                    help="strided-bin pre-NMS top-k (ops/topk.py) for "
                        "throughput — unlike the retired lax.approx_max_k "
                        "it GUARANTEES adjacent-object survival in DOTA's "
                        "dense regime (tests/test_topk.py); the accuracy-"
                        "bearing default stays exact ranking")
    pd.add_argument("--bf16", action="store_true")
    pd.add_argument("--device", type=str, default="")
    pd.set_defaults(fn=cmd_detect)

    pm = sub.add_parser("merge")
    pm.add_argument("--dets", required=True)
    pm.add_argument("--out", required=True)
    pm.add_argument("--names", required=True)
    pm.add_argument("--nms-thres", type=float, default=0.3)
    pm.set_defaults(fn=cmd_merge)

    pe = sub.add_parser("eval")
    pe.add_argument("--dets", required=True)
    pe.add_argument("--gt", required=True)
    pe.add_argument("--names", required=True)
    pe.add_argument("--iou-thres", type=float, default=0.5)
    pe.add_argument("--ap-method", choices=["11point", "continuous"],
                    default="11point")
    pe.add_argument("--json", default="")
    pe.set_defaults(fn=cmd_eval)
    return p


if __name__ == "__main__":
    opt = make_parser().parse_args()
    opt.fn(opt)
