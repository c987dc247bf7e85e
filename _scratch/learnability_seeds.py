#!/usr/bin/env python
"""Multi-seed evidence for the learnability band floor (VERDICT r4 task #6).

Runs the EXACT recipe pinned in tests/test_learnability.py (same synthetic
dataset seed, same CLI flags, same 8-virtual-device CPU backend) at several
train seeds and prints the best-epoch mAP per seed plus min/median. The
band's floor should be set from the observed min; record the numbers in the
test docstring.

Usage: python _scratch/learnability_seeds.py [seed ...]   (default: 0 1 2)
"""
from __future__ import annotations

import os
import statistics
import sys
import tempfile

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cpu_cache")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from rotate_yolov3_tpu.data.synthetic import make_synthetic_dataset

TINY = os.path.join(ROOT, "cfg/yolov3-rotate-tiny.cfg")


def run_seed(seed: int, base: str) -> float:
    import train as train_cli

    ds_dir = os.path.join(base, f"ds_{seed}")
    list_path = make_synthetic_dataset(ds_dir, n_images=16,
                                       img_size=(128, 128),
                                       n_boxes=(1, 3), seed=3)
    data_file = os.path.join(base, f"ds_{seed}.data")
    with open(data_file, "w") as f:
        f.write(f"classes=1\ntrain={list_path}\nvalid={list_path}\n")
    opt = train_cli.make_parser().parse_args([
        "--cfg", TINY, "--data", data_file, "--epochs", "60",
        "--batch-size", "4", "--img-size", "128", "--max-gt", "8",
        "--burn-in", "20", "--no-augment", "--no-tensorboard",
        "--conf-thres", "0.1", "--seed", str(seed),
        "--out-dir", os.path.join(base, f"w_{seed}")])
    return train_cli.train(opt)


def main(seeds):
    results = {}
    with tempfile.TemporaryDirectory() as base:
        for s in seeds:
            best = run_seed(s, base)
            results[s] = best
            print(f"seed {s}: best-epoch mAP {best:.4f}", flush=True)
    vals = sorted(results.values())
    print(f"seeds {sorted(results)}  min {vals[0]:.4f}  "
          f"median {statistics.median(vals):.4f}  max {vals[-1]:.4f}",
          flush=True)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [0, 1, 2])
