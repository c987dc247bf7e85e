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


def test_pallas_degenerate_parallel_and_duplicate_boxes():
    """Configurations that stress the 8-slot candidate compaction:
    identical boxes, parallel-edge (same-angle) overlaps, axis-aligned
    overlaps — where FMA evaluation of the edge cross product can mint
    spurious parallel-edge 'intersections' (caught by the relative
    parallelism threshold; regression for the compaction rewrite)."""
    boxes = np.array([
        [50, 50, 20, 10, 0.8],    # identical pair ->
        [50, 50, 20, 10, 0.8],    #   IoU exactly 1
        [50, 50, 20, 10, 0.0],    # axis-aligned trio with parallel edges
        [55, 50, 20, 10, 0.0],
        [50, 52, 20, 10, 0.0],
        [30, 30, 16, 8, 0.5],     # same-angle shifted (parallel edges)
        [34, 33, 16, 8, 0.5],
    ], np.float32)
    ours = np.asarray(skew_iou_matrix_pallas(
        jnp.asarray(boxes), jnp.asarray(boxes), interpret=True))
    ref = np.asarray(skew_iou_matrix(jnp.asarray(boxes),
                                     jnp.asarray(boxes)))
    np.testing.assert_allclose(np.diag(ours), 1.0, atol=2e-3)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_pallas_large_random_sweep_vs_reference():
    """Wider randomized sweep incl. same-angle pairs (parallel edges)."""
    rng = np.random.default_rng(4)
    n = 64
    a = _random_boxes(rng, n, spread=80.0)
    # force angle collisions: half the boxes share one of 4 angles
    shared = rng.choice([0.0, np.pi / 4, -np.pi / 3, 1.1], size=n // 2)
    a[: n // 2, 4] = shared
    ours = np.asarray(skew_iou_matrix_pallas(
        jnp.asarray(a), jnp.asarray(a), interpret=True))
    ref = np.asarray(skew_iou_matrix(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(ours, ref, atol=3e-3)


def test_pallas_triangle_matches_full_on_upper_triangle():
    """triangle=True must be exact wherever greedy NMS reads (col > row)
    and must skip whole at/below-diagonal tiles (zero-filled)."""
    rng = np.random.default_rng(2)
    k, bn, bm = 96, 16, 32   # grid 6x3: tiles (i>=2,j=0) and (i>=4,j=1) skip
    a = _random_boxes(rng, k, spread=80.0)
    full = np.asarray(skew_iou_matrix_pallas(
        jnp.asarray(a), jnp.asarray(a), block_n=bn, block_m=bm,
        interpret=True))
    tri = np.asarray(skew_iou_matrix_pallas(
        jnp.asarray(a), jnp.asarray(a), block_n=bn, block_m=bm,
        interpret=True, triangle=True))
    iu = np.triu_indices(k, 1)
    np.testing.assert_array_equal(tri[iu], full[iu])
    # the tile at rows [32:48) x cols [0:32) is fully below the diagonal
    np.testing.assert_array_equal(tri[32:48, 0:32], 0.0)


def test_triangle_nms_keep_mask_unchanged():
    """NMS with the triangle kernel = NMS with the full matrix."""
    import functools
    from rotate_yolov3_tpu.ops.rotated_nms import non_max_suppression

    rng = np.random.default_rng(3)
    n = 64
    boxes = _random_boxes(rng, n, spread=50.0)
    scores = rng.uniform(0.2, 1.0, n).astype(np.float32)
    order = np.argsort(-scores)
    # (1, N, 7): 5 box params + objectness + one class prob
    pred = np.concatenate([boxes[order], scores[order, None],
                           np.ones((n, 1), np.float32)], axis=1)[None]

    full_fn = functools.partial(skew_iou_matrix_pallas, interpret=True)
    tri_fn = functools.partial(skew_iou_matrix_pallas, interpret=True,
                               triangle=True)
    d1, m1 = non_max_suppression(jnp.asarray(pred), conf_thres=0.25,
                                 nms_thres=0.3, max_det=n,
                                 iou_matrix_fn=full_fn)
    d2, m2 = non_max_suppression(jnp.asarray(pred), conf_thres=0.25,
                                 nms_thres=0.3, max_det=n,
                                 iou_matrix_fn=tri_fn)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
