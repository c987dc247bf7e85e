"""Training dataset: image list + rotated-label files -> fixed-shape batches.

The reference's ``LoadImagesAndLabels`` (SURVEY.md §2 "dataset / labels") is
a torch Dataset yielding ragged label tensors; this loader keeps its file
conventions — a train.txt listing image paths, per-image label ``.txt`` files
with normalized ``cls x y w h theta`` rows, found by the images->labels path
substitution — but emits **fixed-shape** batches for jit:

    imgs   (B, S, S, 3) uint8 — RGB (converted from cv2 BGR post-augment,
           matching the reference lineage's net-input channel order)
    targets(B, MAX_GT, 6) float32, zero-padded
    valid  (B, MAX_GT) bool

Augmentation (HSV / affine-rotation / flips) runs per-sample on the host via
``data.augment``, seeded per (epoch, index) for reproducibility. A
background thread prefetches batches (the reference's DataLoader-worker
role, SURVEY.md §3.1 "process boundary").
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..config.hyp import Hyp
from .augment import augment_hsv, flip_lr, random_affine
from .letterbox import letterbox


def img2label_path(img_path: str) -> str:
    """images/xxx.jpg -> labels/xxx.txt (reference path convention)."""
    sa, sb = os.sep + "images" + os.sep, os.sep + "labels" + os.sep
    stem = img_path.rsplit(".", 1)[0]
    if sa in img_path:
        stem = stem.replace(sa, sb)
    return stem + ".txt"


def load_labels(path: str) -> np.ndarray:
    """Read one label file -> (N, 6) float32 (cls, x, y, w, h, theta)."""
    if not os.path.exists(path):
        return np.zeros((0, 6), np.float32)
    rows = np.loadtxt(path, ndmin=2, dtype=np.float32)
    if rows.size == 0:
        return np.zeros((0, 6), np.float32)
    if rows.shape[1] != 6:
        raise ValueError(f"{path}: expected 6 columns (cls x y w h theta), "
                         f"got {rows.shape[1]}")
    return rows


class LoadImagesAndLabels:
    """Iterable over fixed-shape training batches."""

    def __init__(self, list_path: str, img_size: int = 608,
                 batch_size: int = 8, augment: bool = False,
                 hyp: Optional[Hyp] = None, max_gt: int = 64,
                 seed: int = 0, drop_last: bool = True,
                 prefetch: int = 2):
        with open(list_path) as f:
            self.img_files = [ln.strip() for ln in f if ln.strip()]
        if not self.img_files:
            raise ValueError(f"empty image list: {list_path}")
        base = os.path.dirname(os.path.abspath(list_path))
        self.img_files = [
            p if os.path.isabs(p) else os.path.join(base, p)
            for p in self.img_files]
        self.label_files = [img2label_path(p) for p in self.img_files]
        self.img_size = img_size
        self.batch_size = batch_size
        self.augment = augment
        self.hyp = hyp or Hyp()
        self.max_gt = max_gt
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self):
        n = len(self.img_files)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    # ---------------- per-sample ----------------
    def _load_sample(self, idx: int, rng: np.random.Generator
                     ) -> Tuple[np.ndarray, np.ndarray]:
        import cv2

        img0 = cv2.imread(self.img_files[idx])
        if img0 is None:
            raise IOError(f"failed to read {self.img_files[idx]}")
        labels0 = load_labels(self.label_files[idx])

        h0, w0 = img0.shape[:2]
        img, ratio, pad = letterbox(img0, self.img_size)
        labels = labels0.copy()
        if len(labels):
            # normalized-in-original -> normalized-in-letterboxed
            labels[:, 1] = (labels0[:, 1] * w0 * ratio + pad[0]) / self.img_size
            labels[:, 2] = (labels0[:, 2] * h0 * ratio + pad[1]) / self.img_size
            labels[:, 3] = labels0[:, 3] * w0 * ratio / self.img_size
            labels[:, 4] = labels0[:, 4] * h0 * ratio / self.img_size

        if self.augment:
            hyp = self.hyp
            img = augment_hsv(img, hyp.hsv_h, hyp.hsv_s, hyp.hsv_v, rng)
            img, labels = random_affine(
                img, labels, hyp.degrees, hyp.translate, hyp.scale,
                hyp.shear, rng)
            if rng.random() < 0.5:
                img, labels = flip_lr(img, labels)
        # BGR -> RGB last, after the cv2-based augmentations — the reference
        # lineage feeds RGB to the net (its __getitem__ flips channels at the
        # end), so .weights interop requires the same channel order here.
        return np.ascontiguousarray(img[..., ::-1]), labels

    def _pad_targets(self, labels: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray]:
        t = np.zeros((self.max_gt, 6), np.float32)
        v = np.zeros((self.max_gt,), bool)
        n = min(len(labels), self.max_gt)
        if n:
            t[:n] = labels[:n]
            v[:n] = True
        return t, v

    # ---------------- batching ----------------
    def _epoch_indices(self) -> np.ndarray:
        order = np.arange(len(self.img_files))
        rng = np.random.default_rng(self.seed + self.epoch)
        rng.shuffle(order)
        return order

    def _make_batch(self, idxs: List[int]) -> Tuple[np.ndarray, np.ndarray,
                                                    np.ndarray]:
        imgs, tgts, vals = [], [], []
        for i in idxs:
            rng = np.random.default_rng(
                (self.seed, self.epoch, int(i)))
            img, labels = self._load_sample(int(i), rng)
            t, v = self._pad_targets(labels)
            imgs.append(img)
            tgts.append(t)
            vals.append(v)
        return (np.stack(imgs), np.stack(tgts), np.stack(vals))

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        order = self._epoch_indices()
        nb = len(self)
        batches = [order[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]
        if self.prefetch <= 0:
            for bidx in batches:
                yield self._make_batch(list(bidx))
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for bidx in batches:
                    q.put(self._make_batch(list(bidx)))
            finally:
                q.put(stop)

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
        th.join()
