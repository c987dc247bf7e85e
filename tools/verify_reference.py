#!/usr/bin/env python
"""Reference-semantics verification artifact (VERDICT r3 missing #2).

`/root/reference/` has been EMPTY since round 1 (mount failure, no
network), so three design decisions rest on BASELINE.json + lineage
knowledge instead of checked code:

  (a) the ``angles=`` cfg field — whether ming71's real cfgs encode anchor
      angles this way (this repo's extension) or differently (e.g. 3-tuple
      anchors, a different key, or hard-coded in models.py);
  (b) the decode parameterisation ``theta = anchor_angle + (pi/6)*tanh(t)``
      (models/yolo_head.py);
  (c) the objectness-ignore semantics (axis-aligned grid-wide ``box_iou``
      by darknet lineage, vs exact rotated IoU — train/loss.py default).

This script turns each guess into a five-minute check the moment a
restored mount (or any checkout of github.com/ming71/rotate-yolov3)
exists: point it at the tree and it (1) parses every real cfg with OUR
parser and inspects the [yolo] blocks' angle encoding, (2) loads real
``.weights``/``.pt`` checkpoints into our model (byte-layout check), and
if torch can import the reference's models.py, dumps per-layer activation
diffs on a shared random input, (3) greps the reference's decode/loss
code for the theta parameterisation and the ignore-mask IoU call and
prints the evidence lines next to our assumptions.

``--self-test`` runs the same machinery against artifacts generated from
THIS repo (cfg + .weights round-trip) so the script itself stays green
and can't rot.

Usage:
  python tools/verify_reference.py [--reference /root/reference]
  python tools/verify_reference.py --self-test
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OURS_THETA = "theta = anchor_angle + (pi/6) * tanh(t_theta)   [models/yolo_head.py]"
OURS_ANGLES = ("[yolo] blocks carry 'angles = a1,a2,...' (degrees); "
               "na = len(mask) * len(angles)   [config/parse.py]")
OURS_IGNORE = ("grid-wide objectness ignore uses AXIS-ALIGNED box_iou "
               "by default (--rotated-ignore for exact)   [train/loss.py]")


def section(title):
    print(f"\n=== {title} " + "=" * max(0, 60 - len(title)), flush=True)


def check_cfgs(ref):
    """(a) parse real cfgs; inspect the anchor-angle encoding."""
    from rotate_yolov3_tpu.config.parse import parse_model_cfg

    section("cfg parsing / anchor-angle encoding")
    cfgs = sorted(glob.glob(os.path.join(ref, "**", "*.cfg"),
                            recursive=True))
    if not cfgs:
        print("NO .cfg files found — cannot verify assumption (a)")
        print(f"ours: {OURS_ANGLES}")
        return None
    ok = True
    for path in cfgs:
        try:
            blocks = parse_model_cfg(path)
        except Exception as e:
            print(f"FAIL parse {path}: {type(e).__name__}: {e}")
            ok = False
            continue
        yolos = [b for b in blocks if b["type"] == "yolo"]
        print(f"ok  {path}: {len(blocks)} blocks, {len(yolos)} yolo heads")
        for i, y in enumerate(yolos):
            anchors = y.get("anchors", [])
            mask = y.get("mask", [])
            n_anchor_vals = len(anchors) if hasattr(anchors, "__len__") else 1
            keys = sorted(set(y) - {"type"})
            print(f"    yolo[{i}] keys={keys}")
            if "angles" in y:
                print(f"    yolo[{i}] has 'angles={y['angles']}' — matches "
                      "our extension (assumption (a) CONFIRMED)")
            elif n_anchor_vals and n_anchor_vals % 3 == 0 and mask:
                print(f"    yolo[{i}] anchors have {n_anchor_vals} values — "
                      "POSSIBLE (w,h,theta) triplet encoding; our parser "
                      "assumed (w,h) pairs + separate 'angles'. REVIEW "
                      "config/parse.py + models/yolo_head.head_anchors")
            else:
                print(f"    yolo[{i}] NO angle encoding in cfg — angles "
                      "likely hard-coded in models.py (grep below); our "
                      "'angles' extension would need a default table")
    print(f"ours: {OURS_ANGLES}")
    return ok


def check_weights(ref):
    """(b1) byte-layout: load real checkpoints into our model."""
    import jax

    from rotate_yolov3_tpu.config.parse import parse_model_cfg
    from rotate_yolov3_tpu.models.darknet import build_network, init_params
    from rotate_yolov3_tpu.models.weights_io import load_weights_file

    section("checkpoint byte-layout")
    cfgs = sorted(glob.glob(os.path.join(ref, "**", "*.cfg"),
                            recursive=True))
    wts = sorted(glob.glob(os.path.join(ref, "**", "*.weights"),
                           recursive=True)
                 + glob.glob(os.path.join(ref, "**", "*.pt"),
                             recursive=True))
    if not wts:
        print("NO .weights/.pt files found — byte-layout unverifiable")
        return None
    if not cfgs:
        print("checkpoints exist but no cfg to build against")
        return None
    ok = True
    for w in wts:
        loaded = False
        for c in cfgs:
            try:
                spec = build_network(parse_model_cfg(c))
                params, state = init_params(spec, jax.random.PRNGKey(0))
                _, _, meta = load_weights_file(spec, params, state, w)
                print(f"ok  {w} loads against {c} (seen={meta.seen}, "
                      f"epoch={meta.epoch})")
                loaded = True
                break
            except Exception:
                continue
        if not loaded:
            print(f"FAIL {w}: loads against no reference cfg — byte layout "
                  "or cfg arithmetic mismatch (see load_darknet_weights "
                  "shape checks for the offending layer)")
            ok = False
    return ok


def check_activations(ref):
    """(b2) per-layer activation diff vs the reference's own torch model."""
    section("activation parity vs reference torch model")
    models_py = sorted(glob.glob(os.path.join(ref, "**", "models.py"),
                                 recursive=True))
    if not models_py:
        print("reference models.py not found — activation diff skipped")
        return None
    print(f"found {models_py[0]} — attempting torch-side forward")
    try:
        import importlib.util

        import numpy as np
        import torch

        sys.path.insert(0, os.path.dirname(models_py[0]))
        spec_ = importlib.util.spec_from_file_location("ref_models",
                                                       models_py[0])
        ref_models = importlib.util.module_from_spec(spec_)
        spec_.loader.exec_module(ref_models)
        cfgs = sorted(glob.glob(os.path.join(ref, "**", "*.cfg"),
                                recursive=True))
        cfg = cfgs[0]
        tmodel = ref_models.Darknet(cfg).eval()

        from rotate_yolov3_tpu.detector import Detector
        det = Detector(cfg, conf_thres=0.0)
        # push OUR params into THEIR model via our .pt writer, then compare
        from rotate_yolov3_tpu.models.weights_io import save_torch_pt
        with tempfile.TemporaryDirectory() as td:
            pt = os.path.join(td, "x.pt")
            save_torch_pt(det.spec, det.params, det.state, pt)
            sd = torch.load(pt, map_location="cpu",
                            weights_only=False)["model"]
            tmodel.load_state_dict(sd, strict=False)
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (1, det.img_size, det.img_size, 3))
        with torch.no_grad():
            tout = tmodel(torch.from_numpy(
                x.transpose(0, 3, 1, 2)).float())
        jout = det.predict_raw((x * 255).astype(np.uint8))
        t = tout[0] if isinstance(tout, (list, tuple)) else tout
        d = np.abs(np.asarray(jout) - t.numpy()).max()
        print(f"decoded-output max abs diff: {d:.3e} "
              f"({'OK' if d < 1e-2 else 'INVESTIGATE — decode semantics '
                 'differ (assumption (b))'})")
        return d < 1e-2
    except Exception as e:
        print(f"torch-side forward failed ({type(e).__name__}: {e}) — "
              "fall back to the grep evidence below")
        return None


def grep_semantics(ref):
    """(b)/(c): locate the theta decode + ignore-mask IoU in reference code."""
    section("decode / ignore-mask semantics (code evidence)")
    pats = {
        "theta decode": re.compile(
            r"(tanh|sigmoid)\s*\(.*(theta|angle|ang)|"
            r"(theta|angle)\s*=.*anchor", re.I),
        "ignore mask": re.compile(
            r"ignore|iou\s*>\s*|wh_iou|box_iou|skewiou", re.I),
    }
    pys = sorted(glob.glob(os.path.join(ref, "**", "*.py"), recursive=True))
    if not pys:
        print("no reference .py files — semantics unverifiable")
        print(f"ours: {OURS_THETA}\nours: {OURS_IGNORE}")
        return None
    for name, pat in pats.items():
        print(f"-- {name} --")
        hits = 0
        for p in pys:
            if os.path.basename(p) not in ("models.py", "utils.py",
                                           "train.py"):
                continue
            try:
                for ln, line in enumerate(open(p, errors="replace"), 1):
                    if pat.search(line) and len(line) < 200:
                        print(f"  {p}:{ln}: {line.rstrip()}")
                        hits += 1
                        if hits > 20:
                            break
            except OSError:
                pass
        if not hits:
            print("  (no hits)")
    print(f"ours: {OURS_THETA}")
    print(f"ours: {OURS_IGNORE}")
    return True


def self_test():
    """Run the cfg/weights machinery against OUR generated artifacts."""
    import jax

    # never touch the single-client TPU from a verification self-test
    # (CLAUDE.md rule 2/3; env vars are baked too early — use jax.config)
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    from rotate_yolov3_tpu.config.parse import parse_model_cfg
    from rotate_yolov3_tpu.models.darknet import build_network, init_params
    from rotate_yolov3_tpu.models.weights_io import save_darknet_weights

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as td:
        # fake "reference" tree from our own cfg + weights
        import shutil
        cfg = os.path.join(root, "cfg/yolov3-rotate-tiny.cfg")
        shutil.copy(cfg, os.path.join(td, "tiny.cfg"))
        spec = build_network(parse_model_cfg(cfg))
        params, state = init_params(spec, jax.random.PRNGKey(0))
        save_darknet_weights(spec, params, state,
                             os.path.join(td, "tiny.weights"), seen=7)
        r1 = check_cfgs(td)
        r2 = check_weights(td)
        assert r1 is True, "self-test: cfg check must pass on our own cfg"
        assert r2 is True, "self-test: weights check must pass"
        grep_semantics(td)
    print("\nself-test OK")
    return 0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--self-test", action="store_true")
    opt = ap.parse_args()
    if opt.self_test:
        return self_test()
    ref = opt.reference
    n = sum(len(fs) for _, _, fs in os.walk(ref)) if os.path.isdir(ref) else 0
    print(f"reference tree: {ref} ({n} files)")
    if n == 0:
        print("EMPTY — nothing to verify (the round-1..4 state). Re-run "
              "when the mount is restored; meanwhile --self-test keeps "
              "this script honest.")
        return 2
    results = [check_cfgs(ref), check_weights(ref), check_activations(ref),
               grep_semantics(ref)]
    section("summary")
    labels = ["cfg/angles", "weights layout", "activation parity",
              "semantics grep"]
    for lbl, r in zip(labels, results):
        print(f"{lbl:20s} {'PASS' if r else 'SKIP/UNVERIFIED' if r is None else 'FAIL'}")
    return 0 if all(r is not False for r in results) else 1


if __name__ == "__main__":
    sys.exit(main())
