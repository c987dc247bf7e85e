"""Model builder / forward / decode / .weights IO tests (SURVEY.md §4)."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rotate_yolov3_tpu.config.parse import parse_model_cfg
from rotate_yolov3_tpu.models import (
    ANGLE_RANGE, apply_fused, apply_network, build_network, count_params,
    decode_all, decode_head, fuse_bn, head_anchors, init_params,
    load_darknet_weights, num_predictions, save_darknet_weights)
from rotate_yolov3_tpu.models.darknet import ConvSpec, YoloSpec

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TINY = os.path.join(ROOT, "cfg/yolov3-rotate-tiny.cfg")
FULL = os.path.join(ROOT, "cfg/yolov3-rotate-hrsc.cfg")


def _tiny_spec(img_size=416):
    return build_network(parse_model_cfg(TINY), img_size=img_size)


def test_build_tiny_structure():
    spec = _tiny_spec()
    assert spec.img_size == 416
    yolos = spec.yolo_specs
    assert len(yolos) == 1
    y = yolos[0]
    assert y.na == 2 * 6      # 2 masked anchors x 6 angles
    assert y.no == 7          # 5 box + obj + 1 class
    # tiny topology: conv/2, conv/2, pool/2, conv/2 (x16) then upsample x2
    assert y.stride == 8


def test_param_count_matches_cfg_arithmetic():
    spec = _tiny_spec()
    params, state = init_params(spec, jax.random.PRNGKey(0))
    expected = 0
    for l in spec.conv_specs:
        expected += l.size * l.size * l.in_c * l.out_c
        expected += 2 * l.out_c if l.bn else l.out_c
    assert count_params(params) == expected
    # state holds 2 arrays per BN conv
    n_bn = sum(1 for l in spec.conv_specs if l.bn)
    assert len(state) == n_bn


def test_full_darknet53_param_count():
    spec = build_network(parse_model_cfg(FULL), img_size=608)
    params, _ = init_params(spec, jax.random.PRNGKey(0))
    n = count_params(params)
    # Darknet-53 backbone alone is ~40.6M; with 3 rotated heads (nc=1,
    # 144-filter preds) the total must be in the 57-66M range.
    assert 55e6 < n < 70e6
    assert len(spec.yolo_specs) == 3
    assert [y.stride for y in spec.yolo_specs] == [32, 16, 8]


def test_forward_shapes_and_determinism():
    spec = _tiny_spec(img_size=128)
    params, state = init_params(spec, jax.random.PRNGKey(1))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 128, 128, 3))
    heads, new_state = apply_network(spec, params, state, x, train=False)
    assert len(heads) == 1
    y = spec.yolo_specs[0]
    g = 128 // y.stride
    assert heads[0].shape == (2, g, g, y.na * y.no)
    heads2, _ = apply_network(spec, params, state, x, train=False)
    np.testing.assert_array_equal(np.asarray(heads[0]), np.asarray(heads2[0]))


def test_train_mode_updates_bn_state():
    spec = _tiny_spec(img_size=64)
    params, state = init_params(spec, jax.random.PRNGKey(1))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3)) * 3 + 1
    _, new_state = apply_network(spec, params, state, x, train=True)
    k = sorted(new_state)[0]
    assert not np.allclose(np.asarray(new_state[k]["bn_mean"]),
                           np.asarray(state[k]["bn_mean"]))
    # eval mode must leave state untouched
    _, same_state = apply_network(spec, params, state, x, train=False)
    assert same_state is state


def test_bn_fusion_matches_unfused():
    spec = _tiny_spec(img_size=64)
    params, state = init_params(spec, jax.random.PRNGKey(3))
    # non-trivial running stats
    state = jax.tree.map(
        lambda a: a + 0.3 * jnp.arange(a.size, dtype=a.dtype) / a.size, state)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 64, 3))
    ref, _ = apply_network(spec, params, state, x, train=False)
    fused = fuse_bn(spec, params, state)
    out = apply_fused(spec, fused, x)
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(out[0]),
                               rtol=2e-4, atol=2e-4)


def test_head_anchor_replication():
    spec = _tiny_spec()
    y = spec.yolo_specs[0]
    awh, aang = head_anchors(y)
    assert awh.shape == (12, 2) and aang.shape == (12,)
    # wh-major, angle-minor ordering
    np.testing.assert_allclose(awh[0], awh[5])        # same wh, 6 angles
    assert not np.allclose(awh[0], awh[6])
    np.testing.assert_allclose(aang[:6], aang[6:])
    np.testing.assert_allclose(aang[2], 0.0)          # angles -60,-30,0,...


def test_decode_math_hand_check():
    """Decode of a hand-built raw map vs explicit arithmetic
    (SURVEY.md §4: 'decode math vs. hand computation')."""
    y = YoloSpec(index=0, anchors_wh=((20.0, 10.0),),
                 anchor_angles=(0.0, math.pi / 2), num_classes=1,
                 stride=8, ignore_thresh=0.5)
    assert y.na == 2 and y.no == 7
    raw = np.zeros((1, 2, 2, y.na * y.no), np.float32)
    # cell (row=1, col=0), anchor 1 (angle pi/2): set tx=0.5, tw=ln2, tth=+1
    view = raw.reshape(1, 2, 2, y.na, y.no)
    view[0, 1, 0, 1] = [0.5, 0.0, math.log(2.0), 0.0, 1.0, 2.0, -1.0]
    out = np.asarray(decode_head(jnp.asarray(raw), y))
    assert out.shape == (1, 2 * 2 * y.na, 7)
    # flat index: ((row*W)+col)*na + a = ((1*2)+0)*2 + 1 = 5
    box = out[0, 5]
    sig = lambda v: 1 / (1 + math.exp(-v))
    assert box[0] == pytest.approx((sig(0.5) + 0) * 8, abs=1e-4)   # cx
    assert box[1] == pytest.approx((sig(0.0) + 1) * 8, abs=1e-4)   # cy
    assert box[2] == pytest.approx(40.0, abs=1e-3)                 # pw*e^ln2
    assert box[3] == pytest.approx(10.0, abs=1e-3)
    assert box[4] == pytest.approx(math.pi / 2 + ANGLE_RANGE * math.tanh(1.0),
                                   abs=1e-4)
    assert box[5] == pytest.approx(sig(2.0), abs=1e-4)
    assert box[6] == pytest.approx(sig(-1.0), abs=1e-4)
    # untouched cells decode to anchor-shaped boxes at their grid centers
    box0 = out[0, 0]
    assert box0[2] == pytest.approx(20.0, abs=1e-3)
    assert box0[5] == pytest.approx(0.5, abs=1e-4)


def test_decode_all_and_num_predictions():
    spec = _tiny_spec(img_size=128)
    params, state = init_params(spec, jax.random.PRNGKey(5))
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 128, 128, 3))
    heads, _ = apply_network(spec, params, state, x, train=False)
    dec = decode_all(heads, spec.yolo_specs)
    spec128 = spec
    assert dec.shape == (2, num_predictions(spec128), 7)
    d = np.asarray(dec)
    assert np.all(np.isfinite(d))
    assert np.all(d[..., 5] >= 0) and np.all(d[..., 5] <= 1)


def test_weights_roundtrip(tmp_path):
    spec = _tiny_spec(img_size=64)
    params, state = init_params(spec, jax.random.PRNGKey(7))
    # randomize BN stats so the roundtrip is non-trivial
    state = jax.tree.map(
        lambda a: a + jax.random.normal(jax.random.PRNGKey(8), a.shape) * 0.1,
        state)
    path = str(tmp_path / "model.weights")
    save_darknet_weights(spec, params, state, path, seen=1234)
    p2, s2, seen = load_darknet_weights(
        spec, *init_params(spec, jax.random.PRNGKey(9)), path)
    assert seen == 1234
    import chex
    chex.assert_trees_all_close(params, p2, rtol=1e-6)
    chex.assert_trees_all_close(state, s2, rtol=1e-6)
    # byte-layout sanity: header(5 int32) + fp32 params + bn stats
    n_f32 = count_params(params) + sum(
        a.size for l in state.values() for a in l.values())
    assert os.path.getsize(path) == 4 * 5 + 4 * n_f32


def test_weights_partial_backbone_load(tmp_path):
    """Pretrained-backbone files stop at a conv boundary (cutoff load)."""
    spec = _tiny_spec(img_size=64)
    params, state = init_params(spec, jax.random.PRNGKey(10))
    path = str(tmp_path / "full.weights")
    save_darknet_weights(spec, params, state, path)
    # truncate after the first 2 conv layers
    convs = spec.conv_specs[:2]
    n = 0
    for l in convs:
        n += l.size * l.size * l.in_c * l.out_c + (4 if l.bn else 1) * l.out_c
    with open(path, "rb") as f:
        data = f.read(20 + 4 * n)
    part = str(tmp_path / "backbone.weights")
    with open(part, "wb") as f:
        f.write(data)
    fresh_p, fresh_s = init_params(spec, jax.random.PRNGKey(11))
    p2, s2, _ = load_darknet_weights(spec, fresh_p, fresh_s, part)
    np.testing.assert_allclose(np.asarray(p2["layer_000"]["kernel"]),
                               np.asarray(params["layer_000"]["kernel"]))
    # layers beyond the cutoff keep their fresh init
    last = sorted(p2)[-1]
    np.testing.assert_allclose(np.asarray(p2[last]["kernel"]),
                               np.asarray(fresh_p[last]["kernel"]))


def test_weights_mismatch_detection(tmp_path):
    spec = _tiny_spec(img_size=64)
    params, state = init_params(spec, jax.random.PRNGKey(12))
    path = str(tmp_path / "bad.weights")
    save_darknet_weights(spec, params, state, path)
    # chop mid-layer: not on a conv boundary
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        data = f.read(size - 40)
    with open(path, "wb") as f:
        f.write(data)
    with pytest.raises(ValueError, match="mid-layer"):
        load_darknet_weights(spec, params, state, path)


# ------------------------- yolov3-tiny family ------------------------------

TINY_REAL = os.path.join(ROOT, "cfg/yolov3-tiny-rotate-hrsc.cfg")


def test_yolov3_tiny_family_builds_and_runs():
    """The lineage's second model family: real yolov3-tiny topology with
    rotated two-scale heads (incl. the stride-1 size-2 maxpool)."""
    spec = build_network(parse_model_cfg(TINY_REAL), img_size=416)
    ys = spec.yolo_specs
    assert [y.stride for y in ys] == [32, 16]
    assert all(y.na == 3 * 6 for y in ys)        # 3 masks x 6 angles
    params, state = init_params(spec, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (1, 416, 416, 3)), jnp.float32)
    heads, _ = apply_network(spec, params, state, x)
    assert heads[0].shape == (1, 13, 13, 18 * 7)
    assert heads[1].shape == (1, 26, 26, 18 * 7)
    # stride-1 maxpool must preserve spatial dims (darknet SAME semantics):
    # stride-32 head on 416 input means no extra downsampling happened
    assert heads[0].shape[1] == 416 // 32


def test_yolov3_tiny_weights_roundtrip(tmp_path):
    spec = build_network(parse_model_cfg(TINY_REAL), img_size=416)
    params, state = init_params(spec, jax.random.PRNGKey(1))
    path = str(tmp_path / "tiny.weights")
    save_darknet_weights(spec, params, state, path, seen=7)
    p2, s2, seen = load_darknet_weights(
        spec, *init_params(spec, jax.random.PRNGKey(2)), path)
    assert seen == 7
    import chex
    chex.assert_trees_all_close(params, p2, rtol=1e-6)
