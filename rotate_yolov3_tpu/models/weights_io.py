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

Native (orbax) checkpoints handle train-state resume; this module is only
the interchange path.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

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
