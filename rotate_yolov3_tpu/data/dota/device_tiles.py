"""On-device DOTA tile pipeline: full source image -> merged detections.

The reference splits huge DOTA scenes OFFLINE on the host
(``DOTA_devkit/ImgSplit.py``), detects per tile, and merges on the host
(``ResultMerge.py``) — three processes and two disk round-trips
(SURVEY.md §3.5). ``data.dota.img_split`` / ``result_merge`` reproduce
that workflow; THIS module is the TPU-first fusion the north star asks
for ("DOTA tile cropping fused into the same XLA graph"): one jitted
program takes the full-resolution source image and returns merged,
source-coordinate detections —

  1. **tile extraction**: the overlapping tile grid is STATIC per source
     shape (``img_split.tile_origins``), so every tile is a static
     ``lax.dynamic_slice`` — no gathers, no host round-trip;
  2. **letterbox**: ``data.letterbox.letterbox_jax`` resizes the (T,
     subsize, subsize, 3) tile batch to the net input size (ratio/pad are
     compile-time constants);
  3. **detection**: the ``Detector`` product graph, batched over tiles
     (the SURVEY §5 spatial/tile-parallelism analog);
  4. **coordinate re-map**: inverse letterbox + tile-origin offset, all
     arithmetic on the fixed-shape (T, K, 7) detection block;
  5. **cross-tile merge**: global score top-k to ``max_merged`` rows,
     then class-aware greedy rotated NMS — the fused single-kernel NMS
     (``ops.nms_pallas``) on TPU, the jnp matrix + fixpoint elsewhere.

Fixed shapes everywhere: the only capacity approximation vs the host
merge is ``max_merged`` (host NMS sees every tile detection; this path
keeps the ``max_merged`` highest-scoring rows first — identical results
whenever total detections fit, pinned in tests/test_device_tiles.py).
Host path stays as the oracle and as the devkit-compatible offline CLI.

Source images of differing sizes are bucketed: (H, W) is padded up to the
next multiple of the tile stride (``subsize - gap``), so each bucket
compiles once (ragged shapes into jit cost a full remote recompile per
shape on this backend — CLAUDE.md rule 6). Devkit ``scale`` handling: this
path runs scale=1 (the reference's default split); rescaled pyramids can
reuse it per scale.

**Tile parallelism** (SURVEY §5: the reference's "scaling" for huge scenes
is spatial tiling — the mesh analog is tiles spread across chips): when the
``Detector`` was built with ``devices=N``, the (T, sub, sub, 3) tile stack
is padded to a multiple of N and annotated with a ``data``-axis sharding
constraint, so GSPMD runs the detection stage data-parallel over the mesh
and inserts the one all-gather the global cross-tile merge needs. Same
program, same results (equivalence pinned on the virtual CPU mesh in
tests/test_device_tiles.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from .img_split import tile_origins


class DeviceTilePipeline:
    """Jitted full-image -> merged-detections pipeline (see module doc).

    Args:
      detector: a ``Detector`` (its ``infer_fn``/``fused_params`` are the
        per-tile detection stage; ``max_det`` is the per-tile capacity).
        If it was built with ``devices=N``, the tile batch is sharded over
        its mesh — tile parallelism, see the module docstring.
      subsize / gap: devkit tile grid parameters (1024/200 defaults).
      merge_nms_thres: cross-tile NMS threshold (devkit merge uses 0.3).
      max_merged: merged-detection capacity per source image.
    """

    def __init__(self, detector, subsize: int = 1024, gap: int = 200,
                 merge_nms_thres: float = 0.3, max_merged: int = 1024):
        assert gap < subsize, (subsize, gap)
        self.det = detector
        self.subsize = int(subsize)
        self.gap = int(gap)
        self.slide = self.subsize - self.gap
        self.merge_nms_thres = float(merge_nms_thres)
        self.max_merged = int(max_merged)
        self._compiled: Dict[Tuple[int, int], object] = {}
        # params the compiled buckets were built against (weight-baked
        # mode): refresh_params on the detector invalidates them
        self._built_params = None

    def bucket_shape(self, h: int, w: int) -> Tuple[int, int]:
        """Pad-up target shape: next slide multiple >= max(dim, subsize)."""
        def up(v):
            v = max(int(v), self.subsize)
            return self.subsize + -(-(v - self.subsize) // self.slide) \
                * self.slide
        return up(h), up(w)

    def _build(self, hp: int, wp: int):
        import jax
        import jax.numpy as jnp

        from ...ops.boxes import scale_coords_rotated
        from ...ops.rotated_nms import _nms_keep
        from ..letterbox import letterbox_jax

        det = self.det
        origins = tile_origins(wp, hp, self.subsize, self.gap)
        t = len(origins)
        sub = self.subsize
        nc = det.spec.yolo_specs[0].num_classes
        m = min(self.max_merged, t * det.max_det)
        thr = self.merge_nms_thres
        # tile parallelism: pad T up to the mesh size so the detection
        # stage shards evenly; padded tiles are zero images whose
        # detections are masked out before the merge
        mesh = getattr(det, "mesh", None)
        n_dev = det.devices if mesh is not None else 1
        t_pad = -(-t // n_dev) * n_dev

        def run(fused_params, img):            # img: (HP, WP, 3) uint8
            tiles = jnp.stack([
                jax.lax.dynamic_slice(img, (y0, x0, 0), (sub, sub, 3))
                for (x0, y0) in origins])      # (T, sub, sub, 3), static
            if t_pad > t:
                tiles = jnp.pad(tiles, ((0, t_pad - t),) + ((0, 0),) * 3)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                tiles = jax.lax.with_sharding_constraint(
                    tiles, NamedSharding(mesh, P("data")))
            lb, ratio, pad = letterbox_jax(tiles.astype(jnp.float32),
                                           det.img_size)
            dets, mask = det.infer_fn(fused_params, lb)   # (T', K, 7)
            mask = mask & (jnp.arange(t_pad) < t)[:, None]
            # letterboxed -> tile coords (static ratio/pad), then + origin
            dets = scale_coords_rotated(dets, ratio, pad)
            ox = jnp.zeros(t_pad, jnp.float32).at[:t].set(
                jnp.asarray([o[0] for o in origins], jnp.float32))
            oy = jnp.zeros(t_pad, jnp.float32).at[:t].set(
                jnp.asarray([o[1] for o in origins], jnp.float32))
            cx = dets[..., 0] + ox[:, None]
            cy = dets[..., 1] + oy[:, None]
            dets = jnp.concatenate(
                [cx[..., None], cy[..., None], dets[..., 2:]], axis=-1)

            # cross-tile merge: global top-k by score, then class-aware NMS
            scores = jnp.where(mask, dets[..., 5], 0.0).reshape(-1)
            flat = dets.reshape(t_pad * det.max_det, 7)
            top_s, top_i = jax.lax.top_k(scores, m)
            rows = flat[top_i]
            valid = top_s > 0.0
            boxes = jnp.where(valid[:, None], rows[:, :5], 0.0)
            cls_id = rows[:, 6].astype(jnp.int32)
            from ...ops.nms_pallas import nms_greedy_fused_ok
            if jax.default_backend() == "tpu" and nms_greedy_fused_ok(m):
                from ...ops.nms_pallas import nms_greedy_pallas
                keep = nms_greedy_pallas(
                    boxes[None], cls_id[None] if nc > 1 else None,
                    valid[None], iou_thr=thr)[0]
            else:
                keep = _nms_keep(None, boxes, cls_id, valid, thr,
                                 use_cls=nc > 1)
            out = jnp.where(keep[:, None], rows, 0.0)
            if m < self.max_merged:
                out = jnp.pad(out, ((0, self.max_merged - m), (0, 0)))
                keep = jnp.pad(keep, (0, self.max_merged - m))
            return out, keep

        if getattr(det, "bake_params", False):
            # weight-baked serving convention (detector.py): closing the
            # jit over the fused params lets XLA fold/pre-lay-out them —
            # measured ~3.5% end-to-end on v5e (docs/PERF.md r5)
            import functools
            return jax.jit(functools.partial(run, det.fused_params))
        return jax.jit(run)

    def __call__(self, img: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Full-resolution HWC RGB image -> (max_merged, 7) dets + mask.

        Detections are (cx, cy, w, h, theta, score, class) in SOURCE-image
        pixels, score-descending, zero-padded with a validity mask.
        """
        h, w = img.shape[:2]
        hp, wp = self.bucket_shape(h, w)
        baked = getattr(self.det, "bake_params", False)
        if baked and self._built_params is not self.det.fused_params:
            # detector params were refreshed: baked buckets are stale
            self._compiled.clear()
            self._built_params = self.det.fused_params
        if (hp, wp) not in self._compiled:
            self._compiled[(hp, wp)] = self._build(hp, wp)
        if (hp, wp) != (h, w):
            padded = np.zeros((hp, wp, 3), img.dtype)
            padded[:h, :w] = img
            img = padded
        import jax
        import jax.numpy as jnp

        img = jnp.asarray(img)
        if getattr(self.det, "mesh", None) is not None:
            # replicate the source image once so the sharded tile stack is
            # sliced device-locally instead of broadcast at trace time
            from jax.sharding import NamedSharding, PartitionSpec as P

            img = jax.device_put(
                img, NamedSharding(self.det.mesh, P()))
        if baked:
            dets, mask = self._compiled[(hp, wp)](img)
        else:
            dets, mask = self._compiled[(hp, wp)](self.det.fused_params, img)
        return np.asarray(dets), np.asarray(mask)

    def num_tiles(self, h: int, w: int) -> int:
        hp, wp = self.bucket_shape(h, w)
        return len(tile_origins(wp, hp, self.subsize, self.gap))
