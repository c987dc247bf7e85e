"""train.py CLI-level behavior: per-batch multi-scale (reference random=1)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rotate_yolov3_tpu.data.synthetic import make_synthetic_dataset

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TINY = os.path.join(ROOT, "cfg/yolov3-rotate-tiny.cfg")


def test_train_cli_multi_scale_per_batch(tmp_path, monkeypatch):
    """--multi-scale with --ms-interval 1 must (a) see >=2 distinct input
    sizes WITHIN one epoch (the reference resizes every ~10 batches, not
    per epoch) and (b) build the train step exactly once per size (the
    per-size jit cache)."""
    import train as train_cli
    from rotate_yolov3_tpu.train import trainer as trainer_mod

    list_path = make_synthetic_dataset(str(tmp_path / "ds"), n_images=8,
                                       img_size=(96, 96), seed=1)
    data_file = tmp_path / "ds.data"
    data_file.write_text(f"classes=1\ntrain={list_path}\n")

    built_sizes = []
    real_make = trainer_mod.make_train_step

    def recording_make(spec, *a, **kw):
        built_sizes.append(spec.img_size)
        return real_make(spec, *a, **kw)

    monkeypatch.setattr(trainer_mod, "make_train_step", recording_make)

    opt = train_cli.make_parser().parse_args([
        "--cfg", TINY, "--data", str(data_file), "--epochs", "1",
        "--batch-size", "2", "--img-size", "64", "--multi-scale",
        "--ms-interval", "1", "--no-eval", "--no-augment",
        "--max-gt", "8", "--burn-in", "2", "--seed", "0",
        "--out-dir", str(tmp_path / "w")])
    train_cli.train(opt)

    # expected sizes from the dataset's deterministic per-batch draw
    base = 64
    scale_sizes = sorted({max(32, (int(base * s) // 32) * 32)
                          for s in np.linspace(0.67, 1.5, 8)})
    expected = []
    for bi in range(4):                    # 8 imgs / bs 2 = 4 batches
        rng = np.random.default_rng((0, 0, bi, 7))
        expected.append(int(scale_sizes[rng.integers(len(scale_sizes))]))

    assert sorted(set(built_sizes)) == sorted(set(expected))
    assert len(set(expected)) >= 2         # seed 0 draws >=2 sizes
    # one step build (= one compile) per size, not per batch
    assert len(built_sizes) == len(set(built_sizes))
