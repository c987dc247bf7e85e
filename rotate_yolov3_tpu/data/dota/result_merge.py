"""Cross-tile detection merge: per-tile results -> source-image results.

Equivalent of the reference's ``DOTA_devkit/ResultMerge.py`` (SURVEY.md §2
"DOTA result merge", §3.5): map per-tile detections back to source-image
coordinates using the ``base__scale__x___y`` tile naming, then run
per-class cross-tile rotated NMS. The NMS here reuses the framework's exact
skew-IoU (jnp on device, or the native C++ polyiou path when built) instead
of a separate SWIG library.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence

import numpy as np

from .img_split import parse_tile_name


def merge_tile_detections(
        tile_dets: Dict[str, np.ndarray],
        nms_thres: float = 0.3) -> Dict[str, np.ndarray]:
    """Merge per-tile detections into per-source-image detections.

    Args:
      tile_dets: {tile_name: (N, 7) array (cx,cy,w,h,theta,score,cls)} in
        tile coordinates.
    Returns:
      {source_image_base: (M, 7)} in source coordinates, cross-tile NMS'd
      per class.
    """
    per_image: Dict[str, List[np.ndarray]] = defaultdict(list)
    for tname, dets in tile_dets.items():
        if len(dets) == 0:
            continue
        base, scale, x0, y0 = parse_tile_name(tname)
        d = np.asarray(dets, np.float32).copy()
        # Devkit semantics: in 'base__scale__x___y' the origin (x0, y0) is
        # in RESIZED-image coordinates, so tile->source is
        # (coord + origin) / scale (ResultMerge poly2origpoly), NOT
        # coord/scale + origin.
        d[:, 0] = (d[:, 0] + x0) / scale
        d[:, 1] = (d[:, 1] + y0) / scale
        d[:, 2] /= scale
        d[:, 3] /= scale
        per_image[base].append(d)

    out: Dict[str, np.ndarray] = {}
    for base, chunks in per_image.items():
        all_dets = np.concatenate(chunks, axis=0)
        out[base] = nms_rotated_np(all_dets, nms_thres)
    return out


def nms_rotated_np(dets: np.ndarray, nms_thres: float) -> np.ndarray:
    """Per-class greedy rotated NMS on host arrays.

    Uses the native C++ polyiou kernel when available (the reference's
    offline merge is C++ too), else the exact jnp skew-IoU matrix.
    """
    if len(dets) == 0:
        return dets
    keep_rows = []
    for c in np.unique(dets[:, 6]):
        d = dets[dets[:, 6] == c]
        order = np.argsort(-d[:, 5], kind="stable")
        d = d[order]
        iou = _iou_matrix_host(d[:, :5])
        alive = np.ones(len(d), bool)
        for i in range(len(d)):
            if not alive[i]:
                continue
            kill = (iou[i] > nms_thres) & (np.arange(len(d)) > i)
            alive &= ~kill
        keep_rows.append(d[alive])
    merged = np.concatenate(keep_rows, axis=0)
    return merged[np.argsort(-merged[:, 5], kind="stable")]


def _iou_matrix_host(boxes: np.ndarray) -> np.ndarray:
    try:
        from ...native import polyiou_native
        return polyiou_native.rbox_iou_matrix(boxes)
    except Exception:
        import jax.numpy as jnp

        from ...ops.skew_iou import skew_iou_matrix
        return np.asarray(skew_iou_matrix(jnp.asarray(boxes),
                                          jnp.asarray(boxes)))


def write_task1_results(merged: Dict[str, np.ndarray],
                        class_names: Sequence[str], out_dir: str) -> None:
    """Write DOTA Task-1 submission files: Task1_{class}.txt with lines
    'image score x1 y1 ... x4 y4' (the devkit output format)."""
    import os

    from .formats import rbox_to_poly

    os.makedirs(out_dir, exist_ok=True)
    files = {c: open(os.path.join(out_dir, f"Task1_{name}.txt"), "w")
             for c, name in enumerate(class_names)}
    try:
        for base, dets in sorted(merged.items()):
            for row in dets:
                c = int(row[6])
                if c not in files:
                    continue
                poly = rbox_to_poly(*row[:5]).reshape(-1)
                coords = " ".join(f"{v:.2f}" for v in poly)
                files[c].write(f"{base} {row[5]:.4f} {coords}\n")
    finally:
        for f in files.values():
            f.close()
