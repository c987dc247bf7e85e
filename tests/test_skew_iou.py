"""Skew-IoU vs an independent Sutherland–Hodgman numpy oracle.

Covers the degenerate cases SURVEY.md §4 calls out: identical boxes,
zero-area, containment, 90°-crossing, vertex-on-edge, plus randomized
fuzzing and differentiability checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rotate_yolov3_tpu.ops.boxes import (
    normalize_angle, poly_area, rbox_aabb, rbox_corners)
from rotate_yolov3_tpu.ops.skew_iou import (
    skew_iou, skew_iou_loss, skew_iou_matrix)

from oracles import rbox_corners_np, skew_iou_np


def _iou(b1, b2):
    return float(skew_iou(jnp.asarray(b1, jnp.float32),
                          jnp.asarray(b2, jnp.float32)))


def test_corners_match_oracle():
    rng = np.random.default_rng(0)
    for _ in range(20):
        b = np.array([rng.uniform(-5, 5), rng.uniform(-5, 5),
                      rng.uniform(0.1, 10), rng.uniform(0.1, 10),
                      rng.uniform(-np.pi, np.pi)])
        ours = np.asarray(rbox_corners(jnp.asarray(b, jnp.float32)))
        ref = rbox_corners_np(b)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_identical_boxes():
    b = np.array([1.0, 2.0, 4.0, 2.0, 0.3])
    assert _iou(b, b) == pytest.approx(1.0, abs=1e-4)


def test_disjoint_boxes():
    a = np.array([0.0, 0.0, 2.0, 2.0, 0.5])
    b = np.array([100.0, 100.0, 2.0, 2.0, -0.7])
    assert _iou(a, b) == pytest.approx(0.0, abs=1e-6)


def test_axis_aligned_analytic():
    # two unit squares overlapping by half
    a = np.array([0.0, 0.0, 2.0, 2.0, 0.0])
    b = np.array([1.0, 0.0, 2.0, 2.0, 0.0])
    # inter = 1x2 = 2, union = 4+4-2 = 6
    assert _iou(a, b) == pytest.approx(2 / 6, abs=1e-4)


def test_ninety_degree_cross():
    # classic plus-sign: 4x1 rect crossed with 1x4 rect at same center
    a = np.array([0.0, 0.0, 4.0, 1.0, 0.0])
    b = np.array([0.0, 0.0, 4.0, 1.0, np.pi / 2])
    # inter = 1x1 = 1, union = 4+4-1 = 7
    assert _iou(a, b) == pytest.approx(1 / 7, abs=1e-4)


def test_containment():
    a = np.array([0.0, 0.0, 10.0, 10.0, 0.2])
    b = np.array([0.0, 0.0, 2.0, 2.0, -1.0])
    assert _iou(a, b) == pytest.approx(4 / 100, abs=1e-4)


def test_rotation_invariance():
    # IoU must be invariant under rotating both boxes together
    a = np.array([0.0, 0.0, 4.0, 2.0, 0.0])
    b = np.array([1.0, 0.5, 3.0, 2.0, 0.4])
    base = _iou(a, b)
    for phi in [0.3, 1.1, -2.0]:
        cos, sin = np.cos(phi), np.sin(phi)
        rot = np.array([[cos, -sin], [sin, cos]])

        def rotate(box):
            c = rot @ box[:2]
            return np.array([c[0], c[1], box[2], box[3], box[4] + phi])

        assert _iou(rotate(a), rotate(b)) == pytest.approx(base, abs=2e-3)


def test_fuzz_vs_oracle():
    rng = np.random.default_rng(42)
    n = 200
    boxes1 = np.stack([
        rng.uniform(-3, 3, n), rng.uniform(-3, 3, n),
        rng.uniform(0.5, 6, n), rng.uniform(0.5, 6, n),
        rng.uniform(-np.pi, np.pi, n)], axis=1)
    boxes2 = np.stack([
        rng.uniform(-3, 3, n), rng.uniform(-3, 3, n),
        rng.uniform(0.5, 6, n), rng.uniform(0.5, 6, n),
        rng.uniform(-np.pi, np.pi, n)], axis=1)
    ours = np.asarray(skew_iou(jnp.asarray(boxes1, jnp.float32),
                               jnp.asarray(boxes2, jnp.float32)))
    ref = np.array([skew_iou_np(b1, b2) for b1, b2 in zip(boxes1, boxes2)])
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_vertex_on_edge_degenerate():
    # box b's corner lies exactly on box a's edge
    a = np.array([0.0, 0.0, 2.0, 2.0, 0.0])
    b = np.array([2.0, 0.0, 2.0, 2.0, 0.0])   # shares the x=1 edge
    assert _iou(a, b) == pytest.approx(0.0, abs=5e-3)
    c = np.array([1.0, 1.0, 2.0, 2.0, 0.0])   # corner-touching overlap 1x1
    expected = 1.0 / (4 + 4 - 1)
    assert _iou(a, c) == pytest.approx(expected, abs=5e-3)


def test_zero_area_box_iou_is_zero():
    # a zero-area box is a point: IoU with anything must be 0, not >1
    # (regression: degenerate inside-test once returned IoU=3.0 here)
    z = np.array([0.0, 0.0, 0.0, 0.0, 0.3])
    b = np.array([0.0, 0.0, 2.0, 2.0, 0.0])
    assert _iou(z, b) == pytest.approx(0.0, abs=1e-6)
    assert _iou(b, z) == pytest.approx(0.0, abs=1e-6)
    assert _iou(z, z) == pytest.approx(0.0, abs=1e-6)


def test_matrix_shape_and_symmetry():
    rng = np.random.default_rng(7)
    a = np.stack([rng.uniform(-2, 2, 5), rng.uniform(-2, 2, 5),
                  rng.uniform(1, 4, 5), rng.uniform(1, 4, 5),
                  rng.uniform(-1, 1, 5)], axis=1).astype(np.float32)
    m = np.asarray(skew_iou_matrix(jnp.asarray(a), jnp.asarray(a)))
    assert m.shape == (5, 5)
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-3)
    np.testing.assert_allclose(m, m.T, atol=1e-3)


def test_loss_differentiable_and_descends():
    target = jnp.asarray([0.0, 0.0, 4.0, 2.0, 0.3], jnp.float32)
    pred = jnp.asarray([1.0, -0.5, 3.0, 2.5, -0.2], jnp.float32)

    loss_fn = lambda p: skew_iou_loss(p, target)
    grad_fn = jax.jit(jax.grad(loss_fn))
    g = grad_fn(pred)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.linalg.norm(g)) > 0

    # a few gradient-descent steps must increase IoU
    p = pred
    before = float(skew_iou(p, target))
    for _ in range(50):
        p = p - 0.05 * grad_fn(p)
    after = float(skew_iou(p, target))
    assert after > before + 0.05


def test_grad_finite_on_degenerates():
    target = jnp.asarray([0.0, 0.0, 2.0, 2.0, 0.0], jnp.float32)
    for pred in [
        [0.0, 0.0, 2.0, 2.0, 0.0],          # identical
        [5.0, 5.0, 2.0, 2.0, 0.0],          # disjoint
        [0.0, 0.0, 2.0, 2.0, np.pi / 2],    # 90° aligned overlap
        [2.0, 0.0, 2.0, 2.0, 0.0],          # shared edge
    ]:
        g = jax.grad(lambda p: skew_iou_loss(p, target))(
            jnp.asarray(pred, jnp.float32))
        assert np.all(np.isfinite(np.asarray(g))), pred


def test_aabb_and_poly_area():
    b = jnp.asarray([0.0, 0.0, 4.0, 2.0, 0.0], jnp.float32)
    aabb = np.asarray(rbox_aabb(b))
    np.testing.assert_allclose(aabb, [-2, -1, 2, 1], atol=1e-5)
    corners = rbox_corners(b)
    assert float(poly_area(corners)) == pytest.approx(8.0, abs=1e-4)


def test_normalize_angle():
    th = jnp.asarray([0.0, np.pi, -np.pi, np.pi / 2, 2.1 * np.pi])
    out = np.asarray(normalize_angle(th))
    assert np.all(out >= -np.pi / 2 - 1e-6) and np.all(out < np.pi / 2 + 1e-6)


def test_sortfree_elementwise_matches_argsort_path():
    """ops.skew_iou_pallas.skew_iou_elementwise (the sort-free form the
    objectness-ignore scan uses — the argsort form inside lax.scan faults
    the TPU backend) must match the argsort-based skew_iou everywhere,
    incl. parallel-edge and identical-box degeneracies."""
    import jax.numpy as jnp

    from rotate_yolov3_tpu.ops.skew_iou import skew_iou
    from rotate_yolov3_tpu.ops.skew_iou_pallas import skew_iou_elementwise

    rng = np.random.default_rng(11)
    n = 800
    mk = lambda: np.stack([
        rng.uniform(0, 600, n), rng.uniform(0, 600, n),
        rng.uniform(5, 200, n), rng.uniform(5, 200, n),
        rng.uniform(-3, 3, n)], axis=1).astype(np.float32)
    b1, b2 = mk(), mk()
    # same-angle shifted pairs (parallel edges) and identical pairs
    b2[:200] = b1[:200]
    b2[200:400, 4] = b1[200:400, 4]
    a = np.asarray(skew_iou(jnp.asarray(b1), jnp.asarray(b2)))
    b = np.asarray(skew_iou_elementwise(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(a, b, atol=2e-3)
    np.testing.assert_allclose(b[:200], 1.0, atol=1e-3)  # identical pairs
