"""High-level detection API: one jitted images -> rotated detections graph.

This is the north-star inference path (BASELINE.json, SURVEY.md §3.2): the
reference runs forward-then-python-NMS with a host sync per image; here
normalisation, the Darknet backbone, rotated decode, confidence top-k, and
rotated NMS compile into a single fixed-shape XLA program that stays on
device end to end.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config.parse import parse_model_cfg
from .models.darknet import (NetworkSpec, apply_fused, build_network,
                             fuse_bn, init_params)
from .models.weights_io import load_weights_file
from .models.yolo_head import decode_all
from .ops.rotated_nms import non_max_suppression_fused


class Detector:
    """Compiled rotated-object detector.

    Mirrors the reference detect.py stack (cfg -> model -> weights -> NMS,
    SURVEY.md §3.2) behind a jitted callable:

        det = Detector("cfg/yolov3-rotate-hrsc.cfg", weights="model.weights")
        boxes, mask = det(images)   # (B,H,W,3) uint8/float -> (B,K,7), (B,K)

    Detection rows are (cx, cy, w, h, theta, score, class) in net-input
    pixels, score-sorted, padded to ``max_det`` with a validity mask.

    Args:
      cfg_path: Darknet .cfg file.
      weights: optional .weights checkpoint to load.
      img_size: net input size (defaults to the cfg's [net] width).
      conf_thres / nms_thres / max_det: post-processing knobs (reference
        detect.py flag names). ``max_det`` caps both pre-NMS candidates and
        output capacity; NMS cost scales ~O(max_det^2) (the pairwise IoU
        matrix), measured 1023/892 img/s at 128/512 on v5e
        (docs/PERF.md). Default 128 suits HRSC-style scenes (tens of
        objects); dense DOTA tiles use 512 (dota.py's default).
      compute_dtype: jnp.bfloat16 puts the conv stack on the MXU's native
        precision (decode/NMS stay f32); float32 for exact parity runs.
      iou_matrix_fn: override the NMS pairwise-IoU implementation (e.g. the
        Pallas kernel from ops.skew_iou_pallas).
      devices: shard inference batches over an N-device data-parallel mesh
        (params replicated, batch split on its leading axis — the SURVEY §5
        spatial/tile-parallelism analog: DOTA tiles spread across chips).
        0/1 = single device. Batch size must be a multiple of ``devices``.
      packed_stem: reparameterise the darknet stem into the exact
        space-to-depth packed form (models.packed_stem) — same math, no
        3-channel full-resolution conv. Default OFF: measured on v5e, the
        packed form is SLOWER (93.6 vs 69.6 us/img stem-only — XLA's TPU
        conv emitter already handles the 3-channel first conv well, see
        docs/PERF.md); the option remains for other backends/shapes.
      approx_top_k: use the strided-bin top-k (``ops.topk.strided_topk``)
        for the pre-NMS candidate selection. Exact top-k over the ~1e5
        per-image scores costs 5% of total inference time on TPU
        (docs/PERF.md); the strided reduction is near-free and — unlike
        the ``lax.approx_max_k`` it replaced in r4 — GUARANTEES two
        adjacent-grid-cell objects both survive selection
        (tests/test_topk.py; approx_max_k leaves that to an unspecified
        window reduction) and behaves identically on every backend.
        None (default): strided on TPU, exact elsewhere (CPU parity paths
        stay bit-reproducible against references that sort exactly).
      iou_algo: per-pair formulation of the NMS kill-mask kernel —
        "green" (Green's-theorem slab clipping), "green2" (the same math
        in B's rotated frame, fewer VPU ops), or "candidates"
        (24-candidate rank-sort cross-check). All exact; measured numbers
        in docs/PERF.md.
      bake_params: close the serving jit over the fused params (XLA
        constants) instead of passing them as a call argument. Weights
        are fixed after load in every serving CLI, and baking lets XLA
        fold/pre-lay-out them at compile time — measured worth ~3% of
        end-to-end throughput on v5e (docs/PERF.md r5 harness-convention
        A/B). The cost is a recompile whenever the params change, so
        train.py's per-epoch-eval Detector passes False and keeps the
        params-as-argument graph that compiles once.
    """

    def __init__(self, cfg_path: str, weights: Optional[str] = None,
                 img_size: Optional[int] = None, conf_thres: float = 0.3,
                 nms_thres: float = 0.4, max_det: int = 128,
                 compute_dtype=jnp.float32, iou_matrix_fn=None,
                 seed: int = 0, devices: int = 0,
                 packed_stem: bool = False,
                 approx_top_k: Optional[bool] = None,
                 field_major_heads: bool = True,
                 iou_algo: str = "green",
                 bake_params: bool = True):
        self.bake_params = bool(bake_params)
        self.spec: NetworkSpec = build_network(
            parse_model_cfg(cfg_path), img_size=img_size)
        self.img_size = self.spec.img_size
        self.conf_thres = conf_thres
        self.nms_thres = nms_thres
        self.max_det = max_det
        self.compute_dtype = compute_dtype

        params, state = init_params(self.spec, jax.random.PRNGKey(seed))
        # two DISTINCT checkpoint counters (weights_io.LoadMeta): `seen` is
        # the darknet images-seen counter (.weights header, burn-in math),
        # `epoch` the torch-lineage epoch index (.pt wrapper, resume
        # numbering) — conflating them breaks LR-burn-in resume arithmetic
        self.seen = 0
        self.epoch = -1
        if weights is not None:
            # .pt (reference torch pickle) or .weights (darknet binary)
            params, state, meta = load_weights_file(
                self.spec, params, state, weights)
            self.seen, self.epoch = meta.seen, meta.epoch
        self.params, self.state = params, state
        self.packed_stem = packed_stem

        # field-major head channels need each head conv to feed ONLY its
        # yolo layer (permuting a routed output would corrupt the other
        # consumer) — true for every darknet yolov3 cfg, checked anyway
        from .models.darknet import ConvSpec
        self.field_major_heads = bool(field_major_heads)
        if self.field_major_heads:
            for ys in self.spec.yolo_specs:
                prev = [l for l in self.spec.layers
                        if getattr(l, "index", None) == ys.index - 1]
                if not (prev and isinstance(prev[0], ConvSpec)
                        and prev[0].out_c == ys.na * ys.no
                        and prev[0].index not in self.spec.routs):
                    self.field_major_heads = False

        self.mesh = None
        if devices and devices > 1:
            from .parallel.mesh import make_mesh
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.mesh = make_mesh(devices)
            self._batch_sharding = NamedSharding(self.mesh, P("data"))
        self.devices = devices if self.mesh is not None else 1

        self.refresh_params()

        if approx_top_k is None:
            approx_top_k = jax.default_backend() == "tpu"
        self.approx_top_k = approx_top_k

        spec = self._infer_spec
        input_scale = self._input_scale
        field_major = self.field_major_heads

        def infer_fn(fused_params, images):
            x = images.astype(compute_dtype)
            if input_scale != 1.0:
                x = x * input_scale
            heads = apply_fused(spec, fused_params, x)
            # score-first path: rank candidates from the raw maps, decode
            # only the top max_det (identical results to decode_all + NMS
            # with exact top-k; see tests/test_nms.py)
            return non_max_suppression_fused(
                heads, spec.yolo_specs, conf_thres=conf_thres,
                nms_thres=nms_thres, max_det=max_det,
                iou_matrix_fn=iou_matrix_fn, approx_top_k=approx_top_k,
                field_major=field_major, iou_algo=iou_algo)

        # the pure function is public so bench.py can scan over EXACTLY the
        # product inference math (VERDICT r1: bench path must == product path)
        self.infer_fn = infer_fn
        self._infer = jax.jit(infer_fn)
        self._infer_baked = None

    def refresh_params(self, params=None, state=None) -> None:
        """Rebuild fused inference params through the FULL fusion pipeline:
        BN fold, packed-stem or 1/255 input-scale fold, field-major head
        permutation, compute-dtype cast, mesh replication.

        Call this after updating ``params``/``state`` (e.g. train.py's
        per-epoch eval). Assigning raw ``fuse_bn`` output to
        ``.fused_params`` directly skips the folds the jitted graph was
        built around and silently corrupts inference.
        """
        from .models.darknet import ConvSpec, _layer_key
        from .models.packed_stem import pack_stem
        from .models.yolo_head import field_major_perm

        if params is not None:
            self.params = params
        if state is not None:
            self.state = state
        fused = fuse_bn(self.spec, self.params, self.state)
        if self.packed_stem:
            # 1/255 normalisation folds into the packed first kernel, so the
            # inference graph consumes raw 0..255 pixel values directly
            self._infer_spec, fused = pack_stem(
                self.spec, fused, input_scale=1.0 / 255.0)
        else:
            self._infer_spec = self.spec
            # fold the 1/255 normalisation into the first fused conv kernel
            # (conv is linear; bias untouched): the elementwise scale pass
            # over the full-resolution input disappears from the graph
            first = next(l for l in self.spec.layers
                         if isinstance(l, ConvSpec))
            key = _layer_key(first.index)
            fused = dict(fused)
            entry = dict(fused[key])
            entry["kernel"] = entry["kernel"] * (1.0 / 255.0)
            fused[key] = entry
        self._input_scale = 1.0
        if self.field_major_heads:
            # permute each head conv's output channels anchor-major ->
            # field-major: obj/cls become contiguous lane slices for the
            # score pass (models.yolo_head.field_major_perm; bit-identical
            # results through the field_major=True decode/score paths)
            fused = dict(fused)
            for ys in self.spec.yolo_specs:
                conv = next(l for l in self.spec.layers
                            if getattr(l, "index", None) == ys.index - 1)
                key = _layer_key(conv.index)
                perm = field_major_perm(ys)
                entry = dict(fused[key])
                entry["kernel"] = entry["kernel"][..., perm]
                entry["bias"] = entry["bias"][perm]
                fused[key] = entry
        if self.compute_dtype != jnp.float32:
            # store inference params in the compute dtype up front: halves
            # their HBM footprint and keeps the per-call kernel casts
            # (apply_fused's astype) no-ops even when XLA doesn't hoist
            # them out of a surrounding scan (bench.py's protocol)
            fused = jax.tree.map(
                lambda a: a.astype(self.compute_dtype), fused)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # replicate weights across the mesh once, up front
            fused = jax.device_put(fused, NamedSharding(self.mesh, P()))
        self.fused_params = fused
        # params changed -> any weight-baked serving jit is stale
        self._infer_baked = None

    def __call__(self, images) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Run detection on (B, H, W, 3) images (uint8 or float 0-255)."""
        images = jnp.asarray(images)
        if images.ndim == 3:
            images = images[None]
        assert images.shape[1] == images.shape[2] == self.img_size, (
            f"expected {self.img_size}x{self.img_size} letterboxed input, "
            f"got {images.shape}; use data.letterbox first")
        if self.mesh is not None:
            assert images.shape[0] % self.devices == 0, (
                f"batch {images.shape[0]} not divisible by "
                f"{self.devices} devices")
            # shard the batch across the mesh; XLA partitions the whole
            # jitted program (backbone + NMS are per-image independent, so
            # this is collective-free data parallelism over ICI)
            images = jax.device_put(images, self._batch_sharding)
        if self.bake_params:
            if self._infer_baked is None:
                self._infer_baked = jax.jit(
                    functools.partial(self.infer_fn, self.fused_params))
            return self._infer_baked(images)
        return self._infer(self.fused_params, images)

    def predict_raw(self, images) -> jnp.ndarray:
        """Decoded predictions before NMS (B, N, 6+nc) — eval-path hook."""
        images = jnp.asarray(images)
        if images.ndim == 3:
            images = images[None]
        if not hasattr(self, "_predict_raw_jit"):
            spec, dtype = self._infer_spec, self.compute_dtype
            input_scale = self._input_scale
            inv_perms = None
            if self.field_major_heads:
                from .models.yolo_head import field_major_perm
                inv_perms = [np.argsort(field_major_perm(ys))
                             for ys in spec.yolo_specs]

            @jax.jit
            def _raw(fused_params, imgs):
                x = imgs.astype(dtype)
                if input_scale != 1.0:
                    x = x * input_scale
                heads = apply_fused(spec, fused_params, x)
                if inv_perms is not None:
                    # undo the field-major head permutation so decode_all
                    # sees canonical anchor-major channels
                    heads = [h[..., jnp.asarray(p)]
                             for h, p in zip(heads, inv_perms)]
                heads = [h.astype(jnp.float32) for h in heads]
                return decode_all(heads, spec.yolo_specs)

            self._predict_raw_jit = _raw
        return self._predict_raw_jit(self.fused_params, images)


def detections_to_numpy(dets, mask):
    """Unpad a fixed-shape detection batch to per-image numpy arrays —
    the boundary where the reference's ragged list-of-boxes API is restored
    for file output / drawing."""
    dets, mask = np.asarray(dets), np.asarray(mask)
    return [d[m] for d, m in zip(dets, mask)]
