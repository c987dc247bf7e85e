"""Dataset evaluation loop: model -> rotated NMS -> mAP.

The reference's ``test.py::test()`` contract (SURVEY.md §3.3): run the model
over a val set, rotated NMS, match to GT by skew-IoU >= 0.5, report
per-class P/R/AP and mAP. Callable standalone (test.py CLI) and from
train.py per epoch.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..data.datasets import LoadImagesAndLabels
from ..detector import detections_to_numpy
from .metrics import match_image, summarize


def evaluate_dataset(detector, list_path: str, batch_size: int = 8,
                     iou_thr: float = 0.5,
                     max_images: Optional[int] = None,
                     names: Sequence[str] = (),
                     method: str = "continuous",
                     max_gt: int = 512, cache_images: str = "",
                     workers: int = 1) -> Dict[str, object]:
    """Evaluate a Detector over an image-list dataset.

    Ground truth is loaded through the same ``LoadImagesAndLabels`` pipeline
    (augment off) so letterboxing matches inference exactly.

    ``max_gt`` is the per-image GT capacity of the fixed-shape batch; any
    image with more labels is truncated, which silently inflates mAP (the
    dropped GT can't be missed), so truncation is counted and reported
    LOUDLY via stderr + the ``n_gt_truncated`` result field.
    """
    import sys

    img_size = detector.img_size
    ds = LoadImagesAndLabels(list_path, img_size=img_size,
                             batch_size=batch_size, augment=False,
                             max_gt=max_gt, drop_last=False, prefetch=2,
                             cache_images=cache_images, workers=workers)
    stats = []
    n_done = 0
    for imgs, tgts, valid in ds:
        # Pad a ragged final batch to batch_size by repeating its last
        # sample (the loaders.batched trick): a smaller batch would be a new
        # jit shape for the detector -> a minutes-long remote recompile on
        # TPU (CLAUDE.md rule 6). Stats below only consume the n_real rows.
        n_real = len(imgs)
        if n_real < batch_size:
            imgs, tgts, valid = (
                np.concatenate(
                    [a, np.repeat(a[-1:], batch_size - n_real, axis=0)],
                    axis=0)
                for a in (imgs, tgts, valid))
        dets, mask = detector(jnp.asarray(imgs))
        per_image = detections_to_numpy(dets, mask)
        for b in range(n_real):
            if max_images is not None and n_done >= max_images:
                break
            n_done += 1
            gt = tgts[b][valid[b]]
            gt_boxes = gt[:, 1:6].copy()
            gt_boxes[:, :4] *= img_size         # normalized -> pixels
            gt_cls = gt[:, 0].astype(int)
            d = per_image[b]
            tp = match_image(d, gt_boxes, gt_cls, iou_thr)
            stats.append((tp, d[:, 5], d[:, 6].astype(int), gt_cls))
        if max_images is not None and n_done >= max_images:
            break
    result = summarize(stats, names=names, method=method)
    result["n_images"] = n_done
    result["n_gt"] = int(sum(len(s[3]) for s in stats))
    result["n_gt_truncated"] = int(ds.truncated_labels)
    if ds.truncated_labels:
        print(
            f"WARNING: {ds.truncated_labels} ground-truth boxes across "
            f"{ds.truncated_images} images exceeded max_gt={max_gt} and "
            f"were DROPPED from matching — the reported mAP is inflated. "
            f"Re-run with a larger --max-gt.", file=sys.stderr)
    return result


def print_eval_table(result: Dict[str, object]) -> None:
    print(f"{'class':>20} {'P':>8} {'R':>8} {'AP':>8}")
    for row in result["per_class"]:
        print(f"{row['name']:>20} {row['p']:8.4f} {row['r']:8.4f} "
              f"{row['ap']:8.4f}")
    print(f"{'all':>20} {result['mp']:8.4f} {result['mr']:8.4f} "
          f"{result['map']:8.4f}")
