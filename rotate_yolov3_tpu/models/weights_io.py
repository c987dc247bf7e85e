"""Darknet ``.weights`` binary checkpoint IO.

Keeps the reference's cross-framework interchange format working
(SURVEY.md §2 "darknet weights IO", §5 "checkpoint / resume"): original
rotate-yolov3 checkpoints load into this framework and vice versa.

Byte layout (the 2019 ultralytics-lineage convention the reference uses):
  * header: 5 x int32 — (major, minor, revision, seen, _pad)
  * then flat float32 parameters, conv layers in cfg order:
      - BN conv:    bn_bias(beta), bn_scale(gamma), bn_mean, bn_var,
                    conv kernel
      - plain conv: conv bias, conv kernel
  * conv kernels are serialized in darknet/torch OIHW order
    (out_c, in_c, kh, kw) row-major; our in-memory layout is HWIO, so load
    transposes (2, 3, 1, 0) and save transposes (3, 2, 0, 1).

The reference's PRIMARY checkpoint format is a torch pickle
(``torch.save({'model': state_dict, ...}) -> last.pt / best.pt``,
SURVEY.md §5 "checkpoint / resume"); published rotate-yolov3 checkpoints are
``.pt`` files. ``load_torch_pt`` / ``save_torch_pt`` map that state_dict
onto the pytree by MODULE ORDER (conv weight, then BN gamma/beta/mean/var
or conv bias — torch's state_dict insertion order for a cfg-built
module_list), so any key-naming vintage of the lineage loads.

Native (orbax) checkpoints handle train-state resume; this module is only
the interchange path.
"""

from __future__ import annotations

import os
from typing import Dict, NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from .darknet import NetworkSpec, _layer_key

_HEADER_DTYPE = np.int32
_HEADER_LEN = 5


def load_darknet_weights(spec: NetworkSpec, params: Dict, state: Dict,
                         path: str) -> Tuple[Dict, Dict, int]:
    """Load a .weights file into (params, state) pytrees.

    ``params``/``state`` provide the target structure (from ``init_params``);
    returns new pytrees plus the header's ``seen`` counter. Supports partial
    loads (e.g. backbone-only ``darknet53.conv.74``-style files): loading
    stops cleanly at EOF on a conv-layer boundary, matching the reference's
    ``cutoff`` behavior for pretrained backbones.
    """
    with open(path, "rb") as f:
        header = np.fromfile(f, dtype=_HEADER_DTYPE, count=_HEADER_LEN)
        if len(header) != _HEADER_LEN:
            raise ValueError(f"truncated .weights header in {path}")
        seen = int(header[3])
        flat = np.fromfile(f, dtype=np.float32)

    new_params = {k: dict(v) for k, v in params.items()}
    new_state = {k: dict(v) for k, v in state.items()}
    ptr = 0

    def take(n: int) -> np.ndarray:
        nonlocal ptr
        if ptr + n > len(flat):
            raise EOFError
        out = flat[ptr:ptr + n]
        ptr += n
        return out

    for layer in spec.conv_specs:
        key = _layer_key(layer.index)
        oc = layer.out_c
        kn = layer.size * layer.size * layer.in_c * oc
        start_ptr = ptr
        try:
            if layer.bn:
                beta = take(oc)
                gamma = take(oc)
                mean = take(oc)
                var = take(oc)
                kernel = take(kn)
                new_params[key]["bn_bias"] = jnp.asarray(beta)
                new_params[key]["bn_scale"] = jnp.asarray(gamma)
                new_state[key]["bn_mean"] = jnp.asarray(mean)
                new_state[key]["bn_var"] = jnp.asarray(var)
            else:
                bias = take(oc)
                kernel = take(kn)
                new_params[key]["bias"] = jnp.asarray(bias)
            oihw = kernel.reshape(oc, layer.in_c, layer.size, layer.size)
            new_params[key]["kernel"] = jnp.asarray(
                np.transpose(oihw, (2, 3, 1, 0)))   # OIHW -> HWIO
        except EOFError:
            if start_ptr == len(flat):
                break   # clean partial load (pretrained-backbone file)
            raise ValueError(
                f"{path}: weights end mid-layer at conv {layer.index} "
                f"(got {len(flat)} floats, layer starts at {start_ptr})")
    else:
        if ptr != len(flat):
            raise ValueError(
                f"{path}: {len(flat) - ptr} unconsumed floats — cfg/weights "
                f"mismatch")
    return new_params, new_state, seen


class LoadMeta(NamedTuple):
    """Checkpoint counters, kept SEPARATE because they mean different
    things: ``seen`` is the darknet header's images-seen counter (drives
    darknet-style LR burn-in), ``epoch`` is the torch-lineage checkpoint's
    epoch index (drives ``--resume`` epoch numbering). A ``.weights`` file
    carries only ``seen``; a ``.pt`` only ``epoch``; the other is its
    neutral default (0 / -1)."""

    seen: int = 0
    epoch: int = -1


def load_weights_file(spec: NetworkSpec, params: Dict, state: Dict,
                    path: str) -> Tuple[Dict, Dict, LoadMeta]:
    """Load either checkpoint flavor by extension: ``.pt`` (torch pickle,
    the reference's primary format) or darknet ``.weights`` binary.

    Returns (params, state, LoadMeta)."""
    if path.endswith(".pt"):
        params, state, epoch = load_torch_pt(spec, params, state, path)
        return params, state, LoadMeta(seen=0, epoch=epoch)
    params, state, seen = load_darknet_weights(spec, params, state, path)
    return params, state, LoadMeta(seen=seen, epoch=-1)


def load_torch_pt(spec: NetworkSpec, params: Dict, state: Dict,
                  path: str) -> Tuple[Dict, Dict, int]:
    """Load a reference-lineage torch ``.pt`` checkpoint into the pytrees.

    Accepts the lineage's ``{'model': state_dict, 'epoch': ..., ...}``
    wrapper or a bare state_dict. Mapping is order-based over the cfg's
    conv layers: per BN conv the tensors appear as
    (conv.weight OIHW, bn.weight, bn.bias, bn.running_mean,
    bn.running_var); per plain conv as (conv.weight, conv.bias);
    ``num_batches_tracked`` buffers are skipped. Shapes are validated
    against the cfg at every step so a cfg/checkpoint mismatch fails
    loudly with the offending layer.

    Returns (params, state, epoch) — epoch is -1 if absent.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    epoch = -1
    sd = ckpt
    if isinstance(ckpt, dict) and not _looks_like_state_dict(ckpt):
        sd = ckpt.get("model", ckpt.get("state_dict"))
        if sd is None:
            raise ValueError(
                f"{path}: no 'model'/'state_dict' entry in checkpoint "
                f"(keys: {sorted(ckpt)})")
        epoch = int(ckpt.get("epoch", -1) or -1)

    tensors = [(k, v.detach().cpu().numpy()) for k, v in sd.items()
               if torch.is_tensor(v)
               and not k.endswith("num_batches_tracked")]
    it = iter(tensors)

    def take(expect_shape, what, layer_idx):
        try:
            key, arr = next(it)
        except StopIteration:
            raise ValueError(
                f"{path}: checkpoint ends before {what} of conv layer "
                f"{layer_idx} — cfg/checkpoint mismatch") from None
        if tuple(arr.shape) != tuple(expect_shape):
            raise ValueError(
                f"{path}: {what} of conv layer {layer_idx}: expected shape "
                f"{tuple(expect_shape)}, got {tuple(arr.shape)} "
                f"(state_dict key {key!r})")
        return arr.astype(np.float32)

    new_params = {k: dict(v) for k, v in params.items()}
    new_state = {k: dict(v) for k, v in state.items()}
    for layer in spec.conv_specs:
        key = _layer_key(layer.index)
        oc, ic, k = layer.out_c, layer.in_c, layer.size
        oihw = take((oc, ic, k, k), "conv weight", layer.index)
        new_params[key]["kernel"] = jnp.asarray(
            np.transpose(oihw, (2, 3, 1, 0)))            # OIHW -> HWIO
        if layer.bn:
            new_params[key]["bn_scale"] = jnp.asarray(
                take((oc,), "bn weight (gamma)", layer.index))
            new_params[key]["bn_bias"] = jnp.asarray(
                take((oc,), "bn bias (beta)", layer.index))
            new_state[key]["bn_mean"] = jnp.asarray(
                take((oc,), "bn running_mean", layer.index))
            new_state[key]["bn_var"] = jnp.asarray(
                take((oc,), "bn running_var", layer.index))
        else:
            new_params[key]["bias"] = jnp.asarray(
                take((oc,), "conv bias", layer.index))
    leftover = list(it)
    if leftover:
        raise ValueError(
            f"{path}: {len(leftover)} unconsumed tensors after the last cfg "
            f"conv layer (first: {leftover[0][0]!r}) — cfg/checkpoint "
            f"mismatch")
    return new_params, new_state, epoch


def _looks_like_state_dict(d: Dict) -> bool:
    """Heuristic: a bare state_dict maps str -> tensor for most entries."""
    import torch

    vals = list(d.values())
    return bool(vals) and all(torch.is_tensor(v) for v in vals)


def save_torch_pt(spec: NetworkSpec, params: Dict, state: Dict, path: str,
                  epoch: int = -1) -> None:
    """Serialize the pytrees as a reference-lineage ``.pt`` checkpoint.

    Emits the lineage wrapper ``{'epoch', 'best_fitness',
    'training_results', 'model', 'optimizer'}`` with state_dict keys in the
    2019-era ``module_list.{i}.{Conv2d,BatchNorm2d}.*`` style (the importer
    above is order-based, so naming only matters cosmetically).
    """
    import collections

    import torch

    sd = collections.OrderedDict()
    for layer in spec.conv_specs:
        key = _layer_key(layer.index)
        i = layer.index
        hwio = np.asarray(params[key]["kernel"], np.float32)
        sd[f"module_list.{i}.Conv2d.weight"] = torch.from_numpy(
            np.transpose(hwio, (3, 2, 0, 1)).copy())
        if layer.bn:
            s = state[key]
            sd[f"module_list.{i}.BatchNorm2d.weight"] = torch.from_numpy(
                np.asarray(params[key]["bn_scale"], np.float32).copy())
            sd[f"module_list.{i}.BatchNorm2d.bias"] = torch.from_numpy(
                np.asarray(params[key]["bn_bias"], np.float32).copy())
            sd[f"module_list.{i}.BatchNorm2d.running_mean"] = (
                torch.from_numpy(np.asarray(s["bn_mean"], np.float32).copy()))
            sd[f"module_list.{i}.BatchNorm2d.running_var"] = (
                torch.from_numpy(np.asarray(s["bn_var"], np.float32).copy()))
            sd[f"module_list.{i}.BatchNorm2d.num_batches_tracked"] = (
                torch.zeros((), dtype=torch.int64))
        else:
            sd[f"module_list.{i}.Conv2d.bias"] = torch.from_numpy(
                np.asarray(params[key]["bias"], np.float32).copy())
    torch.save({"epoch": epoch, "best_fitness": None,
                "training_results": None, "model": sd, "optimizer": None},
               path)


def save_darknet_weights(spec: NetworkSpec, params: Dict, state: Dict,
                         path: str, seen: int = 0) -> None:
    """Serialize (params, state) to the .weights binary format."""
    chunks = [np.array([0, 2, 5, seen, 0], dtype=_HEADER_DTYPE).tobytes()]
    for layer in spec.conv_specs:
        key = _layer_key(layer.index)
        p = params[key]
        if layer.bn:
            s = state[key]
            for arr in (p["bn_bias"], p["bn_scale"], s["bn_mean"],
                        s["bn_var"]):
                chunks.append(np.asarray(arr, np.float32).tobytes())
        else:
            chunks.append(np.asarray(p["bias"], np.float32).tobytes())
        hwio = np.asarray(p["kernel"], np.float32)
        chunks.append(np.transpose(hwio, (3, 2, 0, 1)).tobytes())  # -> OIHW
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        for c in chunks:
            f.write(c)
    os.replace(tmp, path)
