"""decode_rows_pallas (one-hot-matmul gather + in-kernel decode) vs
models.yolo_head.decode_gathered — the jnp reference implementation.

Values must agree to float rounding (the gather itself is EXACT — every
one-hot dot product has one nonzero term — only sigmoid/exp/tanh may
differ by ulps between backends)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rotate_yolov3_tpu.config.parse import parse_model_cfg
from rotate_yolov3_tpu.models.darknet import build_network
from rotate_yolov3_tpu.ops.decode_pallas import (decode_rows_pallas,
                                                 heads_meta)
from rotate_yolov3_tpu.models.yolo_head import decode_gathered

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _setup(cfg, img_size, b, k, seed=0, dtype=jnp.float32):
    spec = build_network(parse_model_cfg(os.path.join(ROOT, cfg)),
                         img_size=img_size)
    rng = np.random.default_rng(seed)
    heads = []
    n_total = 0
    for ys in spec.yolo_specs:
        g = img_size // ys.stride
        heads.append(jnp.asarray(
            rng.normal(0, 0.7, (b, g, g, ys.na * ys.no)), dtype))
        n_total += g * g * ys.na
    idx = jnp.asarray(rng.integers(0, n_total, (b, k)).astype(np.int32))
    valid = jnp.asarray(rng.uniform(0, 1, (b, k)) > 0.2)
    return spec, heads, idx, valid


@pytest.mark.parametrize("cfg,img_size,field_major", [
    ("cfg/yolov3-rotate-tiny.cfg", 128, True),
    ("cfg/yolov3-rotate-tiny.cfg", 128, False),
    ("cfg/yolov3-rotate-dota.cfg", 160, True),   # nc=15: cls argmax path
])
def test_decode_kernel_matches_reference(cfg, img_size, field_major):
    b, k = 3, 64
    spec, heads, idx, valid = _setup(cfg, img_size, b, k)
    ys = spec.yolo_specs
    na, no, nc = ys[0].na, ys[0].no, ys[0].num_classes

    cells = jnp.concatenate(
        [r.reshape(r.shape[0], -1, na * no) for r in heads], axis=1)
    meta = heads_meta(ys, [r.shape for r in heads])
    aos = np.asarray(decode_rows_pallas(
        cells, idx, valid, meta, na=na, nc=nc, field_major=field_major,
        interpret=True))

    rows = decode_gathered(heads, ys, idx, field_major=field_major)
    ref_boxes = np.where(np.asarray(valid)[..., None],
                         np.asarray(rows[..., :5]), 0.0)
    np.testing.assert_allclose(aos[..., :5], ref_boxes,
                               rtol=1e-5, atol=1e-4)
    if nc > 1:
        ref_cls = np.asarray(jnp.argmax(rows[..., 6:], axis=-1))
        np.testing.assert_array_equal(aos[..., 5].astype(np.int32), ref_cls)
    else:
        assert not aos[..., 5].any()
    assert not aos[..., 6:].any()


def test_decode_kernel_bf16_cells_exact_gather():
    """bf16 cell table: the one-hot matmul must reproduce the bf16 raw
    values exactly (f32 accumulation of a single-term dot product)."""
    b, k = 2, 32
    spec, heads, idx, valid = _setup("cfg/yolov3-rotate-tiny.cfg", 128, b, k,
                                     dtype=jnp.bfloat16)
    ys = spec.yolo_specs
    na, no, nc = ys[0].na, ys[0].no, ys[0].num_classes
    cells = jnp.concatenate(
        [r.reshape(r.shape[0], -1, na * no) for r in heads], axis=1)
    meta = heads_meta(ys, [r.shape for r in heads])
    aos = np.asarray(decode_rows_pallas(
        cells, idx, valid, meta, na=na, nc=nc, field_major=True,
        interpret=True))
    rows = decode_gathered([h for h in heads], ys, idx, field_major=True)
    ref = np.where(np.asarray(valid)[..., None],
                   np.asarray(rows[..., :5]), 0.0)
    np.testing.assert_allclose(aos[..., :5], ref, rtol=1e-5, atol=1e-4)


def test_decode_kernel_full_k_and_oob_padding():
    """K not tied to 512; indices covering head boundaries decode with the
    right per-head stride/anchor tables (first/last candidate of each
    head)."""
    b = 1
    spec, heads, _, _ = _setup("cfg/yolov3-rotate-tiny.cfg", 128, b, 8)
    ys = spec.yolo_specs
    na, no, nc = ys[0].na, ys[0].no, ys[0].num_classes
    bounds = []
    off = 0
    for h in heads:
        n = h.shape[1] * h.shape[2] * na
        bounds += [off, off + n - 1]
        off += n
    idx = jnp.asarray(np.array(bounds + [0] * (8 - len(bounds)))[None],
                      jnp.int32)
    valid = jnp.ones((b, 8), bool)
    cells = jnp.concatenate(
        [r.reshape(r.shape[0], -1, na * no) for r in heads], axis=1)
    meta = heads_meta(ys, [r.shape for r in heads])
    aos = np.asarray(decode_rows_pallas(
        cells, idx, valid, meta, na=na, nc=nc, field_major=True,
        interpret=True))
    rows = decode_gathered(heads, ys, idx, field_major=True)
    np.testing.assert_allclose(aos[0, :, :5], np.asarray(rows[0, :, :5]),
                               rtol=1e-5, atol=1e-4)
