"""Packed stem: an exact MXU-friendly reparameterisation of the darknet stem.

The reference network (SURVEY.md §2 "model builder": darknet-53 backbone)
opens with

    conv0: 3 -> 32,  3x3, stride 1   (full resolution, 3 input channels)
    conv1: 32 -> 64, 3x3, stride 2   (downsample to half resolution)

On paper this stem is MXU-hostile: the MXU contracts over 128-wide channel
blocks, so conv0's 27-long contraction (3x3x3) and 32-wide output both pad
heavily. The classic fix is space-to-depth (group 2x2 pixel blocks into
channels); this module folds the s2d permutation INTO the conv kernels so
no transpose is ever materialised.

**Measured outcome (v5e, docs/PERF.md): the packed form LOSES.** Stem-only
microbenchmark at B=128 @608²: canonical 69.6 µs/img vs packed 93.6 µs/img
— XLA's TPU conv emitter already restructures small-channel convolutions
efficiently, and the packed kernels' 1.78× raw-FLOP inflation (structural
zeros the MXU still multiplies) outweighs the layout win. The module stays
as (a) a tested, exact reparameterisation usable on backends where the
trade goes the other way, and (b) the recorded evidence for why
``Detector`` defaults to the canonical stem. The transform itself:

  * ``conv0'``: a 4x4 stride-2 conv from the RAW image straight into the
    space-to-depth layout of conv0's output. For output phase (di, dj) and
    channel co at s2d cell (i, j), conv0's 3x3 window around original pixel
    (2i+di, 2j+dj) is contained in the 4x4 input window rows 2i-1..2i+2 —
    so scattering W0's taps into a (4, 4, 3, 4*C0) kernel (zero where the
    tap falls outside the 3x3 support) reproduces s2d(conv0(x)) exactly as
    an ordinary convolution. Contraction 4*4*3 = 48, output 4*32 = 128
    channels at quarter spatial size: both MXU dimensions usefully filled.
  * ``conv1'``: a 2x2 stride-1 conv consuming that s2d layout. conv1's 3x3
    stride-2 window centred at (2m, 2n) spans original rows 2m-1..2m+1 =
    s2d cells m-1..m, so a (2, 2, 4*C0, C1) kernel with W1's taps placed at
    (u, v) = (2*alpha - 2 + di, 2*beta - 2 + dj) reproduces conv1's output
    in the STANDARD layout — the s2d detour begins and ends inside the two
    kernels, and every later layer is untouched.

Leaky ReLU is elementwise, so it commutes with the channel permutation and
runs unchanged between the two packed convs. Zero padding is preserved:
conv0' pads (1, 2) per side (rows -1 and 608..610 of a 608 input are zero,
exactly the rows conv0/s2d padding would zero), conv1' pads (1, 0) (cell -1
is conv1's padded row -1; its phase-0 sub-row is only ever multiplied by
structurally-zero taps).

The transform applies to BN-fused inference parameters (``fuse_bn`` output)
and is numerically exact up to float reassociation; ``pack_stem`` is the
public entry, used by ``Detector`` on its inference spec. Training and
``.weights``/``.pt`` IO always use the canonical spec.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from .darknet import ConvSpec, NetworkSpec, _layer_key


def can_pack_stem(spec: NetworkSpec) -> bool:
    """True if the network opens with the darknet conv3x3/s1 + conv3x3/s2
    stem pattern and nothing routes to the intermediate (layer 0) output."""
    if len(spec.layers) < 2:
        return False
    l0, l1 = spec.layers[0], spec.layers[1]
    return (isinstance(l0, ConvSpec) and isinstance(l1, ConvSpec)
            and l0.size == 3 and l0.stride == 1 and l0.pad is None
            and l1.size == 3 and l1.stride == 2 and l1.pad is None
            and l0.activation == l1.activation == "leaky"
            and spec.img_size % 2 == 0
            and 0 not in spec.routs)


def _pack_conv0(w0: np.ndarray, b0: np.ndarray) -> Tuple[np.ndarray,
                                                         np.ndarray]:
    """(3,3,C,C0) stride-1 kernel -> (4,4,C,4*C0) stride-2 s2d-output kernel.

    Packed output channel index = (di*2 + dj)*C0 + co, i.e. the s2d layout
    of conv0's output with phase-major channel order.
    """
    kh, kw, cin, c0 = w0.shape
    assert kh == kw == 3
    k = np.zeros((4, 4, cin, 4 * c0), w0.dtype)
    for di in range(2):
        for dj in range(2):
            sl = slice((di * 2 + dj) * c0, (di * 2 + dj + 1) * c0)
            # tap (ai, bi) of the 4x4 window is original offset
            # (ai - 1 - di, bi - 1 - dj) from the (2i+di, 2j+dj) centre;
            # valid taps satisfy 0 <= ai - di <= 2.
            k[di:di + 3, dj:dj + 3, :, sl] = w0
    bias = np.tile(b0, 4)
    return k, bias


def _pack_conv1(w1: np.ndarray) -> np.ndarray:
    """(3,3,C0,C1) stride-2 kernel -> (2,2,4*C0,C1) stride-1 kernel reading
    the s2d layout produced by ``_pack_conv0`` (bias is unchanged)."""
    kh, kw, c0, c1 = w1.shape
    assert kh == kw == 3
    k = np.zeros((2, 2, 4 * c0, c1), w1.dtype)
    for alpha in range(2):
        for beta in range(2):
            for di in range(2):
                for dj in range(2):
                    u = 2 * alpha - 2 + di   # original row offset in -1..1
                    v = 2 * beta - 2 + dj
                    if -1 <= u <= 1 and -1 <= v <= 1:
                        sl = slice((di * 2 + dj) * c0, (di * 2 + dj + 1) * c0)
                        k[alpha, beta, sl, :] = w1[u + 1, v + 1]
    return k


def pack_stem(spec: NetworkSpec, fused_params: Dict,
              input_scale: float = 1.0) -> Tuple[NetworkSpec, Dict]:
    """Reparameterise the stem of a BN-fused network (see module docstring).

    Args:
      spec: canonical NetworkSpec whose stem matches ``can_pack_stem``.
      fused_params: ``fuse_bn`` output pytree for ``spec``.
      input_scale: folded into the first kernel — pass 1/255 to absorb the
        uint8 image normalisation (one fewer full-resolution elementwise
        pass; the caller then feeds raw 0..255 values).
    Returns:
      (packed_spec, packed_params) producing bit-for-bit the same layer-1
      output (up to float reassociation); layers >= 2 are shared untouched.
    """
    assert can_pack_stem(spec), "network stem does not match the packed form"
    l0: ConvSpec = spec.layers[0]
    l1: ConvSpec = spec.layers[1]

    k0, b0 = _pack_conv0(
        np.asarray(fused_params[_layer_key(0)]["kernel"],
                   np.float32) * input_scale,
        np.asarray(fused_params[_layer_key(0)]["bias"], np.float32))
    k1 = _pack_conv1(
        np.asarray(fused_params[_layer_key(1)]["kernel"], np.float32))
    b1 = np.asarray(fused_params[_layer_key(1)]["bias"], np.float32)

    new_l0 = ConvSpec(index=0, in_c=l0.in_c, out_c=4 * l0.out_c, size=4,
                      stride=2, bn=False, activation=l0.activation,
                      pad=((1, 2), (1, 2)))
    new_l1 = ConvSpec(index=1, in_c=4 * l0.out_c, out_c=l1.out_c, size=2,
                      stride=1, bn=False, activation=l1.activation,
                      pad=((1, 0), (1, 0)))
    packed_spec = dataclasses.replace(
        spec, layers=(new_l0, new_l1) + spec.layers[2:])

    packed_params = dict(fused_params)
    packed_params[_layer_key(0)] = {"kernel": jnp.asarray(k0),
                                    "bias": jnp.asarray(b0)}
    packed_params[_layer_key(1)] = {"kernel": jnp.asarray(k1),
                                    "bias": jnp.asarray(b1)}
    return packed_spec, packed_params
