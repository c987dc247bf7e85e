"""Packed-stem reparameterisation (models/packed_stem.py): exactness.

The packed stem must be a pure reparameterisation — same function, different
kernels — so the oracle is the canonical network itself, on random weights
and random inputs (including edge content, where the padding rules differ
structurally between the two forms)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rotate_yolov3_tpu.config.parse import parse_model_cfg
from rotate_yolov3_tpu.models import (apply_fused, build_network,
                                      can_pack_stem, fuse_bn, init_params,
                                      pack_stem)
from rotate_yolov3_tpu.models.darknet import _layer_key

CFG = "cfg/yolov3-rotate-hrsc.cfg"


def _build(img_size=96):
    spec = build_network(parse_model_cfg(CFG), img_size=img_size)
    params, state = init_params(spec, jax.random.PRNGKey(3))
    # randomise BN stats so fuse_bn is non-trivial
    state = jax.tree.map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(4), a.shape),
        state)
    state = {k: {"bn_mean": v["bn_mean"],
                 "bn_var": jnp.abs(v["bn_var"]) + 0.1}
             for k, v in state.items()}
    return spec, fuse_bn(spec, params, state)


def test_can_pack_stem_darknet():
    spec, _ = _build()
    assert can_pack_stem(spec)


def test_packed_stem_layer1_output_exact():
    """s2d never leaves the kernels: layer-1 output matches exactly."""
    spec, fused = _build()
    pspec, pfused = pack_stem(spec, fused)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 96, 96, 3)).astype(np.float32))

    def stem(s, p, x):
        from rotate_yolov3_tpu.models.darknet import _activate, _conv
        for layer in s.layers[:2]:
            pp = p[_layer_key(layer.index)]
            x = _conv(x, pp["kernel"].astype(x.dtype), layer.stride,
                      layer.pad)
            x = _activate(x + pp["bias"].astype(x.dtype), layer.activation)
        return x

    ref = stem(spec, fused, x)
    packed = stem(pspec, pfused, x)
    assert ref.shape == packed.shape == (2, 48, 48, 64)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_stem_full_network_heads_match():
    spec, fused = _build()
    pspec, pfused = pack_stem(spec, fused)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 96, 96, 3)).astype(np.float32))
    heads_ref = apply_fused(spec, fused, x)
    heads_pk = apply_fused(pspec, pfused, x)
    assert len(heads_ref) == len(heads_pk)
    for hr, hp in zip(heads_ref, heads_pk):
        np.testing.assert_allclose(np.asarray(hp), np.asarray(hr),
                                   rtol=1e-4, atol=1e-4)


def test_packed_stem_param_shapes():
    spec, fused = _build()
    pspec, pfused = pack_stem(spec, fused)
    assert pfused[_layer_key(0)]["kernel"].shape == (4, 4, 3, 128)
    assert pfused[_layer_key(0)]["bias"].shape == (128,)
    assert pfused[_layer_key(1)]["kernel"].shape == (2, 2, 128, 64)
    # later layers are shared, not copied
    assert pfused[_layer_key(2)]["kernel"] is fused[_layer_key(2)]["kernel"]
    assert pspec.layers[2:] == spec.layers[2:]


def test_detector_packed_vs_canonical_same_detections():
    """Product-level check: Detector(packed) == Detector(canonical) on a
    synthetic scene, in float32 where reassociation noise is ~1e-6."""
    from rotate_yolov3_tpu.detector import Detector

    det_ref = Detector(CFG, img_size=96, conf_thres=1e-4, max_det=32,
                       seed=7, packed_stem=False)
    det_pk = Detector(CFG, img_size=96, conf_thres=1e-4, max_det=32,
                      seed=7, packed_stem=True)
    assert det_pk.packed_stem and not det_ref.packed_stem

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (1, 96, 96, 3), dtype=np.uint8)
    d_ref, m_ref = det_ref(img)
    d_pk, m_pk = det_pk(img)
    np.testing.assert_array_equal(np.asarray(m_pk), np.asarray(m_ref))
    np.testing.assert_allclose(np.asarray(d_pk), np.asarray(d_ref),
                               rtol=1e-3, atol=1e-3)


def test_detector_defaults_to_canonical_stem():
    # measured on v5e: the packed form is slower than XLA's native handling
    # of the 3-channel first conv (docs/PERF.md) — default must stay off
    from rotate_yolov3_tpu.detector import Detector

    assert not Detector(CFG, img_size=96).packed_stem
    assert not Detector(CFG, img_size=96,
                        compute_dtype=jnp.bfloat16).packed_stem
