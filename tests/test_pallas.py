"""Pallas skew-IoU kernel (interpret mode on CPU) vs the jnp reference."""

import jax.numpy as jnp
import numpy as np

from rotate_yolov3_tpu.ops.skew_iou import skew_iou_matrix
from rotate_yolov3_tpu.ops.skew_iou_pallas import skew_iou_matrix_pallas


def _random_boxes(rng, n, spread=100.0):
    return np.stack([
        rng.uniform(0, spread, n), rng.uniform(0, spread, n),
        rng.uniform(5, 30, n), rng.uniform(5, 30, n),
        rng.uniform(-np.pi, np.pi, n)], axis=1).astype(np.float32)


def test_pallas_matches_jnp_reference():
    rng = np.random.default_rng(0)
    a = _random_boxes(rng, 17, spread=60.0)   # deliberately non-multiples
    b = _random_boxes(rng, 33, spread=60.0)
    ours = np.asarray(skew_iou_matrix_pallas(
        jnp.asarray(a), jnp.asarray(b), interpret=True))
    ref = np.asarray(skew_iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    assert ours.shape == (17, 33)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_pallas_identity_and_padding():
    rng = np.random.default_rng(1)
    a = _random_boxes(rng, 5)
    m = np.asarray(skew_iou_matrix_pallas(
        jnp.asarray(a), jnp.asarray(a), interpret=True))
    np.testing.assert_allclose(np.diag(m), 1.0, atol=2e-3)
    np.testing.assert_allclose(m, m.T, atol=2e-3)


def test_pallas_zero_area_padding_is_zero():
    a = np.array([[10, 10, 5, 5, 0.3], [0, 0, 0, 0, 0]], np.float32)
    m = np.asarray(skew_iou_matrix_pallas(
        jnp.asarray(a), jnp.asarray(a), interpret=True))
    assert m[0, 1] == 0.0 and m[1, 0] == 0.0 and m[1, 1] == 0.0
