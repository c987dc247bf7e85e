"""Functional Darknet network builder: cfg block dicts -> jitted apply fn.

TPU-native redesign of the reference's ``models.py::create_modules`` /
``Darknet`` (SURVEY.md §2 "model builder", "Darknet module"): instead of a
mutable ``nn.ModuleList`` walked with Python-side caching, the cfg is compiled
once into a static tuple of layer specs, and ``apply`` is a pure function over
an explicit parameter pytree — fully traceable, so backbone + decode + NMS
fuse into one XLA program.

Design notes (TPU-first):
  * NHWC activations / HWIO kernels — the layouts XLA's TPU conv emitter
    prefers; convolutions land on the MXU.
  * ``params`` holds trainables (conv kernels/biases, BN scale/shift);
    ``state`` holds BN running statistics, threaded functionally
    (``apply(..., train=True)`` returns the updated state).
  * BN supports cross-device synchronisation via ``axis_name`` (psum over the
    data-parallel mesh axis) — the TPU-native upgrade of the reference's
    unsynced per-GPU BN.
  * ``fuse_bn`` folds BN into conv kernel/bias for inference — one less
    HBM-bound elementwise pass per conv (XLA usually fuses it anyway, but
    folding also shrinks the param pytree and removes the math entirely).
  * All shapes are static; spatial strides per layer are derived statically
    from the cfg so YOLO head strides are known without tracing.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BN_EPS = 1e-5
_BN_UPDATE = 0.1        # running = (1-u)*running + u*batch  (torch-equivalent)
_LEAKY_SLOPE = 0.1


@dataclasses.dataclass(frozen=True)
class ConvSpec:
    index: int
    in_c: int
    out_c: int
    size: int
    stride: int
    bn: bool
    activation: str          # 'leaky' | 'linear' | 'relu'
    # Explicit ((top, bottom), (left, right)) spatial padding. None = the
    # darknet default k//2 symmetric padding. Asymmetric padding is used by
    # the packed-stem reparameterisation (models.packed_stem).
    pad: Optional[Tuple[Tuple[int, int], Tuple[int, int]]] = None


@dataclasses.dataclass(frozen=True)
class RouteSpec:
    index: int
    layers: Tuple[int, ...]  # absolute source layer indices


@dataclasses.dataclass(frozen=True)
class ShortcutSpec:
    index: int
    frm: int                 # absolute source layer index


@dataclasses.dataclass(frozen=True)
class UpsampleSpec:
    index: int
    stride: int


@dataclasses.dataclass(frozen=True)
class MaxPoolSpec:
    index: int
    size: int
    stride: int


@dataclasses.dataclass(frozen=True)
class YoloSpec:
    """Static metadata of one rotated YOLO head.

    ``anchors_wh`` are the masked (w, h) anchors in net-input pixels;
    each is replicated at every ``anchor_angles`` entry (radians), so the
    effective per-cell anchor count is ``len(anchors_wh) * len(angles)``
    (SURVEY.md §2 "rotated YOLO head": angle-offset anchors).
    """
    index: int
    anchors_wh: Tuple[Tuple[float, float], ...]
    anchor_angles: Tuple[float, ...]
    num_classes: int
    stride: int
    ignore_thresh: float

    @property
    def na(self) -> int:
        return len(self.anchors_wh) * len(self.anchor_angles)

    @property
    def no(self) -> int:
        # x, y, w, h, theta, obj + classes
        return 6 + self.num_classes


LayerSpec = Any


@dataclasses.dataclass(frozen=True)
class NetworkSpec:
    """Static compiled form of a Darknet cfg."""
    layers: Tuple[LayerSpec, ...]
    routs: Tuple[int, ...]         # layer indices whose outputs are cached
    img_size: int
    channels: int
    hyp: Tuple[Tuple[str, Any], ...]   # [net] block key/values

    @property
    def yolo_specs(self) -> Tuple[YoloSpec, ...]:
        return tuple(l for l in self.layers if isinstance(l, YoloSpec))

    @property
    def conv_specs(self) -> Tuple[ConvSpec, ...]:
        return tuple(l for l in self.layers if isinstance(l, ConvSpec))

    def hyperparams(self) -> Dict[str, Any]:
        return dict(self.hyp)


def build_network(module_defs: Sequence[Dict[str, Any]],
                  img_size: Optional[int] = None) -> NetworkSpec:
    """Compile parsed cfg blocks into a static NetworkSpec.

    Mirrors the contract of the reference's ``create_modules`` (SURVEY.md §2):
    tracks per-layer output channels, resolves relative route/shortcut
    indices, and records which layer outputs must be cached. Additionally
    derives each layer's cumulative spatial stride statically so YOLO head
    strides need no tracing.
    """
    net = module_defs[0]
    assert net["type"] in ("net", "network")
    if img_size is None:
        img_size = int(net.get("width", 416))
    channels = int(net.get("channels", 3))

    layer_defs = module_defs[1:]
    specs: List[LayerSpec] = []
    out_c: List[int] = []      # output channels per layer
    strides: List[int] = []    # cumulative downsample factor per layer
    routs: set = set()

    for i, mdef in enumerate(layer_defs):
        t = mdef["type"]
        prev_c = out_c[i - 1] if i > 0 else channels
        prev_s = strides[i - 1] if i > 0 else 1
        if t == "convolutional":
            stride = int(mdef.get("stride", 1))
            specs.append(ConvSpec(
                index=i, in_c=prev_c, out_c=int(mdef["filters"]),
                size=int(mdef["size"]), stride=stride,
                bn=bool(mdef.get("batch_normalize", 0)),
                activation=str(mdef.get("activation", "linear"))))
            out_c.append(int(mdef["filters"]))
            strides.append(prev_s * stride)
        elif t == "maxpool":
            stride = int(mdef.get("stride", 1))
            specs.append(MaxPoolSpec(index=i, size=int(mdef["size"]),
                                     stride=stride))
            out_c.append(prev_c)
            strides.append(prev_s * stride)
        elif t == "upsample":
            stride = int(mdef.get("stride", 2))
            specs.append(UpsampleSpec(index=i, stride=stride))
            out_c.append(prev_c)
            assert prev_s % stride == 0, "upsample below stride 1"
            strides.append(prev_s // stride)
        elif t == "route":
            abs_layers = tuple(l if l >= 0 else i + l for l in mdef["layers"])
            for l in abs_layers:
                if not (0 <= l < i):
                    raise ValueError(f"route {i}: bad source layer {l}")
                routs.add(l)
            specs.append(RouteSpec(index=i, layers=abs_layers))
            out_c.append(sum(out_c[l] for l in abs_layers))
            strides.append(strides[abs_layers[0]])
        elif t == "shortcut":
            frm = mdef["from"]
            frm = frm[0] if isinstance(frm, list) else frm
            frm = frm if frm >= 0 else i + frm
            if not (0 <= frm < i):
                raise ValueError(f"shortcut {i}: bad source layer {frm}")
            if out_c[frm] != prev_c:
                raise ValueError(
                    f"shortcut {i}: channel mismatch {out_c[frm]} vs {prev_c}")
            routs.add(frm)
            specs.append(ShortcutSpec(index=i, frm=frm))
            out_c.append(prev_c)
            strides.append(prev_s)
        elif t == "yolo":
            anchors = mdef["anchors"]
            wh_pairs = [(anchors[2 * k], anchors[2 * k + 1])
                        for k in range(len(anchors) // 2)]
            masked = tuple(tuple(wh_pairs[m]) for m in mdef["mask"])
            angles_deg = mdef.get("angles", [0.0])
            angles = tuple(math.radians(a) for a in angles_deg)
            nc = int(mdef["classes"])
            stride = prev_s
            expected = len(masked) * len(angles) * (6 + nc)
            if prev_c != expected:
                raise ValueError(
                    f"yolo {i}: preceding conv has {prev_c} filters, expected "
                    f"{expected} = n_mask*n_angles*(6+classes)")
            specs.append(YoloSpec(
                index=i, anchors_wh=masked, anchor_angles=angles,
                num_classes=nc, stride=stride,
                ignore_thresh=float(mdef.get("ignore_thresh", 0.5))))
            out_c.append(prev_c)
            strides.append(prev_s)
        else:
            raise ValueError(f"unsupported layer type [{t}] at {i}")

    hyp = tuple(sorted((k, v if not isinstance(v, list) else tuple(v))
                       for k, v in net.items() if k != "type"))
    return NetworkSpec(layers=tuple(specs), routs=tuple(sorted(routs)),
                       img_size=img_size, channels=channels, hyp=hyp)


# --------------------------------------------------------------------------
# parameter init / apply
# --------------------------------------------------------------------------

def _layer_key(i: int) -> str:
    return f"layer_{i:03d}"


def init_params(spec: NetworkSpec, rng: jax.Array,
                dtype=jnp.float32) -> Tuple[Dict, Dict]:
    """Initialise (params, state) pytrees for a NetworkSpec.

    Kernel init is He-uniform fan-in (the darknet scheme); BN starts at
    identity; running stats at (0, 1).
    """
    params: Dict[str, Dict[str, jnp.ndarray]] = {}
    state: Dict[str, Dict[str, jnp.ndarray]] = {}
    for layer in spec.layers:
        if not isinstance(layer, ConvSpec):
            continue
        rng, k = jax.random.split(rng)
        fan_in = layer.in_c * layer.size * layer.size
        bound = 1.0 / math.sqrt(fan_in)
        kernel = jax.random.uniform(
            k, (layer.size, layer.size, layer.in_c, layer.out_c),
            dtype, -bound, bound)
        p: Dict[str, jnp.ndarray] = {"kernel": kernel}
        if layer.bn:
            p["bn_scale"] = jnp.ones((layer.out_c,), dtype)
            p["bn_bias"] = jnp.zeros((layer.out_c,), dtype)
            state[_layer_key(layer.index)] = {
                "bn_mean": jnp.zeros((layer.out_c,), dtype),
                "bn_var": jnp.ones((layer.out_c,), dtype),
            }
        else:
            p["bias"] = jnp.zeros((layer.out_c,), dtype)
        params[_layer_key(layer.index)] = p
    return params, state


def _conv(x: jnp.ndarray, kernel: jnp.ndarray, stride: int,
          pad: Optional[Tuple[Tuple[int, int], Tuple[int, int]]] = None
          ) -> jnp.ndarray:
    # Darknet pads symmetrically by k//2 (torch Conv2d padding=k//2). XLA's
    # "SAME" differs for stride-2 (asymmetric 0/1 padding), which would
    # spatially shift every downsample layer vs the reference checkpoints —
    # so the padding is explicit.
    if pad is None:
        k = kernel.shape[0]
        pad = ((k // 2, k // 2), (k // 2, k // 2))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _activate(x: jnp.ndarray, activation: str) -> jnp.ndarray:
    if activation == "leaky":
        return jax.nn.leaky_relu(x, _LEAKY_SLOPE)
    if activation == "relu":
        return jax.nn.relu(x)
    if activation == "linear":
        return x
    raise ValueError(f"unknown activation {activation}")


def _apply_conv(layer: ConvSpec, p: Dict, s: Optional[Dict], x: jnp.ndarray,
                train: bool, axis_name: Optional[str]):
    """Conv -> (BN) -> activation. Returns (y, new_bn_state_or_None)."""
    y = _conv(x, p["kernel"].astype(x.dtype), layer.stride, layer.pad)
    new_state = None
    if layer.bn:
        if train:
            # Batch statistics accumulate in f32 DURING the reduction
            # (dtype=) — materialising an f32 copy of every conv output
            # made train-mode forward 2x slower than inference in bf16
            mean = jnp.mean(y, axis=(0, 1, 2), dtype=jnp.float32)
            msq = jnp.mean(jnp.square(y), axis=(0, 1, 2),
                           dtype=jnp.float32)
            if axis_name is not None:
                # sync-BN: average the raw moments across the axis FIRST,
                # then form the variance — pmean of per-device variances
                # would miss the variance of the per-device means
                mean = jax.lax.pmean(mean, axis_name)
                msq = jax.lax.pmean(msq, axis_name)
            var = msq - jnp.square(mean)
            # torch BatchNorm2d parity: normalisation uses the biased batch
            # variance (var above) but running_var accumulates the UNBIASED
            # n/(n-1) variance; n counts every element behind the channel
            # reduction, across the sync axis when present.
            n = float(y.shape[0] * y.shape[1] * y.shape[2])
            if axis_name is not None:
                n = n * jax.lax.psum(1.0, axis_name)
            unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
            new_state = {
                "bn_mean": ((1 - _BN_UPDATE) * s["bn_mean"]
                            + _BN_UPDATE * mean),
                "bn_var": ((1 - _BN_UPDATE) * s["bn_var"]
                           + _BN_UPDATE * unbiased),
            }
        else:
            mean = s["bn_mean"].astype(jnp.float32)
            var = s["bn_var"].astype(jnp.float32)
        inv = jax.lax.rsqrt(var + _BN_EPS) * p["bn_scale"].astype(jnp.float32)
        shift = p["bn_bias"].astype(jnp.float32) - mean * inv
        if train:
            # per-channel scalars cast down; elementwise math stays in the
            # compute dtype (identical for f32 runs; ~1-ulp for bf16)
            y = y * inv.astype(x.dtype) + shift.astype(x.dtype)
        else:
            y = (y.astype(jnp.float32) * inv + shift).astype(x.dtype)
    else:
        y = y + p["bias"].astype(x.dtype)
    return _activate(y, layer.activation), new_state


def _upsample_nearest(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    # nearest-neighbour via repeat: cheap, layout-friendly on TPU
    x = jnp.repeat(x, stride, axis=1)
    return jnp.repeat(x, stride, axis=2)


def _maxpool(x: jnp.ndarray, size: int, stride: int) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, size, size, 1), (1, stride, stride, 1),
        "SAME")


def apply_network(spec: NetworkSpec, params: Dict, state: Dict,
                  x: jnp.ndarray, train: bool = False,
                  axis_name: Optional[str] = None):
    """Run the network. ``x`` is NHWC.

    Returns ``(head_outputs, new_state)`` where ``head_outputs`` is a list of
    raw per-head maps ``(B, H, W, na*(6+nc))`` in YOLO-layer order — the
    training-mode contract of the reference's ``Darknet.forward``
    (SURVEY.md §3.4). Decoding to boxes lives in ``models.yolo_head`` so the
    eval path composes as ``decode_all(spec, apply_network(...))`` inside one
    jit.
    """
    cache: Dict[int, jnp.ndarray] = {}
    head_outputs: List[jnp.ndarray] = []
    new_state: Dict[str, Dict[str, jnp.ndarray]] = {}
    routs = set(spec.routs)
    for layer in spec.layers:
        i = layer.index
        if isinstance(layer, ConvSpec):
            key = _layer_key(i)
            x, ns = _apply_conv(layer, params[key], state.get(key), x,
                                train, axis_name)
            if ns is not None:
                new_state[key] = ns
        elif isinstance(layer, ShortcutSpec):
            x = x + cache[layer.frm]
        elif isinstance(layer, RouteSpec):
            if len(layer.layers) == 1:
                x = cache[layer.layers[0]]
            else:
                x = jnp.concatenate([cache[l] for l in layer.layers], axis=-1)
        elif isinstance(layer, UpsampleSpec):
            x = _upsample_nearest(x, layer.stride)
        elif isinstance(layer, MaxPoolSpec):
            x = _maxpool(x, layer.size, layer.stride)
        elif isinstance(layer, YoloSpec):
            head_outputs.append(x)
        if i in routs:
            cache[i] = x
    if train:
        merged = dict(state)
        merged.update(new_state)
        return head_outputs, merged
    return head_outputs, state


def fuse_bn(spec: NetworkSpec, params: Dict, state: Dict) -> Dict:
    """Fold BN into conv kernel/bias for inference.

    Returns a new params pytree where every BN conv becomes kernel'+bias':
      kernel' = kernel * gamma / sqrt(var + eps)
      bias'   = beta - mean * gamma / sqrt(var + eps)
    The returned pytree is applied with ``apply_fused`` (same network walk,
    convs treated as bias-only).
    """
    fused: Dict[str, Dict[str, jnp.ndarray]] = {}
    for layer in spec.conv_specs:
        key = _layer_key(layer.index)
        p = params[key]
        if layer.bn:
            s = state[key]
            inv = (p["bn_scale"]
                   / jnp.sqrt(s["bn_var"].astype(jnp.float32) + _BN_EPS))
            fused[key] = {
                "kernel": p["kernel"] * inv[None, None, None, :],
                "bias": p["bn_bias"] - s["bn_mean"] * inv,
            }
        else:
            fused[key] = {"kernel": p["kernel"], "bias": p["bias"]}
    return fused


def apply_fused(spec: NetworkSpec, fused_params: Dict, x: jnp.ndarray):
    """Inference-only forward with BN pre-folded (see ``fuse_bn``)."""
    cache: Dict[int, jnp.ndarray] = {}
    head_outputs: List[jnp.ndarray] = []
    routs = set(spec.routs)
    for layer in spec.layers:
        i = layer.index
        if isinstance(layer, ConvSpec):
            p = fused_params[_layer_key(i)]
            x = _conv(x, p["kernel"].astype(x.dtype), layer.stride, layer.pad)
            x = x + p["bias"].astype(x.dtype)
            x = _activate(x, layer.activation)
        elif isinstance(layer, ShortcutSpec):
            x = x + cache[layer.frm]
        elif isinstance(layer, RouteSpec):
            if len(layer.layers) == 1:
                x = cache[layer.layers[0]]
            else:
                x = jnp.concatenate([cache[l] for l in layer.layers], axis=-1)
        elif isinstance(layer, UpsampleSpec):
            x = _upsample_nearest(x, layer.stride)
        elif isinstance(layer, MaxPoolSpec):
            x = _maxpool(x, layer.size, layer.stride)
        elif isinstance(layer, YoloSpec):
            head_outputs.append(x)
        if i in routs:
            cache[i] = x
    return head_outputs


def count_params(params: Dict) -> int:
    return sum(int(np.prod(v.shape))
               for layer in params.values() for v in layer.values())
