"""Green's-theorem skew-IoU: equivalence vs oracle/argsort paths, gradients,
degenerate coincidence families, and the Pallas tile body (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from rotate_yolov3_tpu.ops.skew_iou import skew_iou, skew_iou_matrix
from rotate_yolov3_tpu.ops.skew_iou_green import (skew_iou_green,
                                                  skew_iou_matrix_green)
from rotate_yolov3_tpu.ops.skew_iou_pallas import skew_iou_matrix_pallas

from oracles import skew_iou_np


def _random_boxes(rng, n, spread=100.0, wh=(5, 30)):
    return np.stack([
        rng.uniform(0, spread, n), rng.uniform(0, spread, n),
        rng.uniform(*wh, n), rng.uniform(*wh, n),
        rng.uniform(-np.pi, np.pi, n)], axis=1).astype(np.float32)


def test_green_matches_oracle_random_sweep():
    rng = np.random.default_rng(0)
    a = _random_boxes(rng, 300, spread=60.0)
    b = _random_boxes(rng, 300, spread=60.0)
    got = np.asarray(skew_iou_green(jnp.asarray(a), jnp.asarray(b)))
    ref = np.array([skew_iou_np(x, y) for x, y in zip(a, b)])
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_green_matrix_matches_argsort_matrix():
    rng = np.random.default_rng(1)
    a = _random_boxes(rng, 48, spread=50.0)
    b = _random_boxes(rng, 37, spread=50.0)
    got = np.asarray(skew_iou_matrix_green(jnp.asarray(a), jnp.asarray(b)))
    ref = np.asarray(skew_iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_green_coincidence_families_exact():
    """The configurations the compaction path cannot guarantee — exact
    boundary coincidences — are EXACT under the asymmetric-σ Green
    formulation (they are common in grid-world detection data)."""
    cases = [
        # identical boxes -> 1
        ([50, 50, 20, 10, 0.8], [50, 50, 20, 10, 0.8], 1.0),
        ([3, 4, 6, 6, -1.1], [3, 4, 6, 6, -1.1], 1.0),
        # axis-aligned side-by-side TOUCHING (shared edge line) -> 0
        ([50, 50, 20, 10, 0.0], [70, 50, 20, 10, 0.0], 0.0),
        ([50, 50, 20, 10, 0.0], [50, 60, 20, 10, 0.0], 0.0),
        # rotated touching pair (shared edge line at 30 deg) -> 0
        ([0, 0, 20, 10, np.pi / 6],
         [20 * np.cos(np.pi / 6), 20 * np.sin(np.pi / 6), 20, 10,
          np.pi / 6], 0.0),
        # overlapping with collinear top/bottom edges (same y-band):
        # inter = 15x10, union = 2*200-150
        ([0, 0, 20, 10, 0.0], [5, 0, 20, 10, 0.0], 150.0 / 250.0),
        # contained sharing the top edge line: inter = small box
        ([0, 0, 20, 10, 0.0], [0, 2.5, 10, 5, 0.0], 50.0 / 200.0),
        # corner-exactly-on-edge with interior corners (the compaction
        # path's degenerate family): diamond/square from test_pallas
        ([-1, 0, 2 * np.sqrt(2), 2 * np.sqrt(2), np.pi / 4],
         [0, 0, 2, 2, 0.0], None),   # checked vs oracle below
        # fully contained -> small/large
        ([10, 10, 4, 2, 0.3], [10, 10, 40, 20, 1.2], None),
        # zero-area (padding) boxes -> 0 against anything
        ([0, 0, 0, 0, 0.0], [5, 5, 10, 10, 0.7], 0.0),
        ([0, 0, 0, 0, 0.0], [0, 0, 0, 0, 0.0], 0.0),
    ]
    for b1, b2, expected in cases:
        b1 = np.asarray(b1, np.float32)
        b2 = np.asarray(b2, np.float32)
        got = float(skew_iou_green(jnp.asarray(b1), jnp.asarray(b2)))
        got_t = float(skew_iou_green(jnp.asarray(b2), jnp.asarray(b1)))
        if expected is None:
            expected = skew_iou_np(b1, b2)
        assert abs(got - expected) < 1e-3, (b1, b2, got, expected)
        assert abs(got_t - expected) < 1e-3, "not symmetric"


def test_green_corner_touch_family_tight():
    """The projected-corner-touch family that costs the compaction path a
    dropped vertex (test_pallas pins 0.034 error there) is tight here."""
    from rotate_yolov3_tpu.ops.boxes import rbox_corners

    rng = np.random.default_rng(11)
    n = 256
    bs = _random_boxes(rng, n, spread=10.0)
    as_ = _random_boxes(rng, n, spread=10.0)
    bc = np.asarray(rbox_corners(jnp.asarray(bs)))
    ac = np.asarray(rbox_corners(jnp.asarray(as_)))
    for i in range(n):
        p, q = bc[i, 0], bc[i, 1]
        t = rng.uniform(0.1, 0.9)
        as_[i, :2] += (p + t * (q - p)) - ac[i, 0]
    got = np.asarray(skew_iou_green(jnp.asarray(as_), jnp.asarray(bs)))
    ref = np.array([skew_iou_np(x, y) for x, y in zip(as_, bs)])
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_green_gradients_match_finite_difference():
    """Differentiability: the loss path needs d(IoU)/d(box). Check autodiff
    against central differences on smoothly-overlapping configs."""
    b1 = jnp.asarray([10.0, 12.0, 8.0, 5.0, 0.4])
    b2 = jnp.asarray([11.5, 10.5, 7.0, 6.0, -0.3])

    f = lambda x: skew_iou_green(x, b2)
    g = jax.grad(lambda x: jnp.sum(f(x)))(b1)
    eps = 1e-3
    for i in range(5):
        e = jnp.zeros(5).at[i].set(eps)
        fd = (f(b1 + e) - f(b1 - e)) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=0.05, atol=5e-3)
    # gradient is finite everywhere on a random overlapping sweep
    rng = np.random.default_rng(3)
    a = _random_boxes(rng, 64, spread=20.0)
    b = _random_boxes(rng, 64, spread=20.0)
    ga = jax.grad(
        lambda x: jnp.sum(skew_iou_green(x, jnp.asarray(b))))(jnp.asarray(a))
    assert np.isfinite(np.asarray(ga)).all()


def test_green_scan_safe():
    """The argsort-based skew_iou inside lax.scan crashes the TPU worker
    at grid scale (CLAUDE.md rule 8); the Green path has no sort — assert
    it runs under scan and matches the direct evaluation."""
    rng = np.random.default_rng(5)
    a = _random_boxes(rng, 32, spread=30.0)
    gts = _random_boxes(rng, 8, spread=30.0)

    def body(best, gt):
        iou = skew_iou_green(jnp.asarray(a), gt[None, :])
        return jnp.maximum(best, iou), None

    best, _ = jax.lax.scan(body, jnp.zeros(32), jnp.asarray(gts))
    direct = np.asarray(
        skew_iou_green(jnp.asarray(a)[:, None, :],
                       jnp.asarray(gts)[None, :, :])).max(axis=1)
    np.testing.assert_allclose(np.asarray(best), direct, atol=1e-6)


def test_pallas_green_tile_matches_jnp_and_candidates():
    rng = np.random.default_rng(7)
    a = _random_boxes(rng, 45, spread=60.0)
    b = _random_boxes(rng, 70, spread=60.0)
    green = np.asarray(skew_iou_matrix_pallas(
        jnp.asarray(a), jnp.asarray(b), interpret=True, algo="green"))
    cand = np.asarray(skew_iou_matrix_pallas(
        jnp.asarray(a), jnp.asarray(b), interpret=True, algo="candidates"))
    ref = np.asarray(skew_iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(green, ref, atol=2e-3)
    np.testing.assert_allclose(green, cand, atol=2e-3)


def test_pallas_green_triangle_nms_keep_mask_unchanged():
    """Product contract: switching the NMS kernel to the Green body must
    not change which detections survive."""
    import functools

    from rotate_yolov3_tpu.ops.rotated_nms import (_class_masked_iou,
                                                   greedy_suppress_fixpoint)

    rng = np.random.default_rng(9)
    n = 96
    boxes = _random_boxes(rng, n, spread=80.0)
    # score-sorted rows, some clustered duplicates to exercise suppression
    boxes[n // 2:] = boxes[:n // 2] + rng.normal(0, 1.5, (n // 2, 5)).astype(
        np.float32) * np.array([1, 1, 1, 1, 0.05], np.float32)
    order = np.argsort(-rng.uniform(size=n))
    boxes = boxes[order]
    cls = (rng.integers(0, 3, n)).astype(np.int32)
    valid = jnp.asarray(rng.uniform(size=n) > 0.1)

    keeps = {}
    for algo in ("green", "candidates"):
        fn = functools.partial(skew_iou_matrix_pallas, interpret=True,
                               triangle=True, algo=algo)
        iou = _class_masked_iou(fn, jnp.asarray(boxes), jnp.asarray(cls))
        keeps[algo] = np.asarray(
            greedy_suppress_fixpoint(iou, valid, 0.4))
    np.testing.assert_array_equal(keeps["green"], keeps["candidates"])
    assert keeps["green"].any()


def test_bframe_green_matches_green():
    """inter_area_green_bframe == inter_area_green (same math in B's
    rotated frame) on random and degenerate configs, and the kill-mask
    kernel with algo="green2" keeps the same detections."""
    from rotate_yolov3_tpu.ops.skew_iou_green import (inter_area_green,
                                                      inter_area_green_bframe)
    from rotate_yolov3_tpu.ops.skew_iou_pallas import skew_kill_matrix_pallas

    rng = np.random.default_rng(21)
    a = _random_boxes(rng, 128, spread=60.0)
    b = _random_boxes(rng, 128, spread=60.0)
    # degenerate rows: identical pair, same-angle shifted, touching,
    # axis-aligned, contained, zero-area padding
    a[:6] = [[10, 10, 8, 4, 0.3], [10, 10, 8, 4, 0.3], [14, 10, 8, 4, 0.3],
             [20, 10, 4, 4, 0.0], [10, 10, 40, 20, 1.2], [0, 0, 0, 0, 0.0]]
    b[:6] = a[:6]

    def args(x):
        x = jnp.asarray(x)
        return x[:, 0], x[:, 1], x[:, 2], x[:, 3], x[:, 4]

    g1 = np.asarray(inter_area_green(*args(a), *args(b)))
    g2 = np.asarray(inter_area_green_bframe(*args(a), *args(b)))
    scale = 1.0 + np.maximum(g1, 0.0)
    np.testing.assert_allclose(g2 / scale, g1 / scale, atol=1e-4)

    k1 = np.asarray(skew_kill_matrix_pallas(
        jnp.asarray(a), None, iou_thr=0.4, block_n=16, block_m=32,
        interpret=True, algo="green"))
    k2 = np.asarray(skew_kill_matrix_pallas(
        jnp.asarray(a), None, iou_thr=0.4, block_n=16, block_m=32,
        interpret=True, algo="green2"))
    np.testing.assert_array_equal(k1, k2)
