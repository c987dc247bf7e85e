"""Assignment + loss tests: hand-checked matching, gradient sanity,
fixed-seed descent (SURVEY.md §4 'fixed-seed 1-step train loss repro')."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rotate_yolov3_tpu.config.hyp import Hyp
from rotate_yolov3_tpu.models.darknet import YoloSpec
from rotate_yolov3_tpu.models.yolo_head import ANGLE_RANGE, head_anchors
from rotate_yolov3_tpu.train.assign import build_targets_head
from rotate_yolov3_tpu.train.loss import compute_loss

IMG = 64


def _spec(stride=8, nc=1, ignore=0.5):
    return YoloSpec(index=0, anchors_wh=((16.0, 8.0), (32.0, 32.0)),
                    anchor_angles=(0.0, math.pi / 2), num_classes=nc,
                    stride=stride, ignore_thresh=ignore)


def _gt(cx, cy, w, h, th, cls=0):
    """One GT, normalized to IMG, padded to 4 slots."""
    t = np.zeros((1, 4, 6), np.float32)
    t[0, 0] = [cls, cx / IMG, cy / IMG, w / IMG, h / IMG, th]
    v = np.zeros((1, 4), bool)
    v[0, 0] = True
    return jnp.asarray(t), jnp.asarray(v)


def test_assignment_cell_and_anchor():
    spec = _spec()
    # GT matching anchor 0 (16x8 at angle 0) exactly, center in cell (2, 3)
    t, v = _gt(cx=2 * 8 + 3, cy=3 * 8 + 5, w=16, h=8, th=0.0)
    out = build_targets_head(t, v, spec, IMG, iou_t=0.2)
    assert bool(out.assigned[0, 0])
    grid = IMG // spec.stride
    na = spec.na
    # flat = (gj*grid + gi)*na + best_a ; best anchor = (wh 0, angle 0) -> 0
    expected_flat = (3 * grid + 2) * na + 0
    assert int(out.flat_idx[0, 0]) == expected_flat
    np.testing.assert_allclose(np.asarray(out.txy[0, 0]), [3 / 8, 5 / 8],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.twh[0, 0]), [0.0, 0.0],
                               atol=1e-4)
    assert float(out.tangle[0, 0]) == pytest.approx(0.0, abs=1e-5)
    # obj grid has exactly one positive
    assert float(out.obj_target.sum()) == 1.0


def test_assignment_angle_selects_rotated_anchor():
    spec = _spec()
    # same wh but rotated ~90deg -> anchor index 1 of the first wh pair
    # (angles are (0, pi/2), wh-major/angle-minor -> idx 1)
    t, v = _gt(cx=20, cy=20, w=16, h=8, th=math.pi / 2 - 0.05)
    out = build_targets_head(t, v, spec, IMG, iou_t=0.2)
    assert bool(out.assigned[0, 0])
    assert int(out.flat_idx[0, 0]) % spec.na == 1
    assert float(out.tangle[0, 0]) == pytest.approx(-0.05, abs=1e-4)


def test_assignment_threshold_rejects_bad_fit():
    spec = _spec()
    # box far bigger than any anchor -> low wh-IoU -> unassigned
    t, v = _gt(cx=32, cy=32, w=300, h=300, th=0.0)
    out = build_targets_head(t, v, spec, IMG, iou_t=0.2)
    assert not bool(out.assigned[0, 0])
    assert int(out.flat_idx[0, 0]) == -1
    assert float(out.obj_target.sum()) == 0.0


def test_padding_rows_never_assign():
    spec = _spec()
    t = jnp.zeros((2, 4, 6), jnp.float32)
    v = jnp.zeros((2, 4), bool)
    out = build_targets_head(t, v, spec, IMG, iou_t=0.2)
    assert not bool(out.assigned.any())
    assert float(out.obj_target.sum()) == 0.0


def test_objectness_ignore_matches_numpy_oracle():
    """Reference darknet semantics, cross-checked by an independent numpy
    re-implementation: a prediction ANYWHERE on the grid whose decoded box
    has skew-IoU > ignore_thresh with ANY GT is excluded from the no-object
    penalty (VERDICT r1 'ignore-region semantics')."""
    from oracles import skew_iou_np
    from rotate_yolov3_tpu.models.yolo_head import (ANGLE_RANGE,
                                                    decode_boxes_grid,
                                                    head_anchors,
                                                    reshape_head)
    from rotate_yolov3_tpu.train.loss import objectness_ignore

    spec = _spec(ignore=0.4)
    g = IMG // spec.stride
    rng = np.random.default_rng(0)
    raw = rng.normal(0, 0.7, (1, g, g, spec.na * spec.no)).astype(np.float32)
    # two GT: one normal, one large (covers several neighbour cells)
    t = np.zeros((1, 4, 6), np.float32)
    t[0, 0] = [0, 20 / IMG, 20 / IMG, 18 / IMG, 9 / IMG, 0.2]
    t[0, 1] = [0, 44 / IMG, 40 / IMG, 34 / IMG, 30 / IMG, -0.5]
    gt_px = t[0, :, 1:6].copy()
    gt_px[:, :4] *= IMG

    got = np.asarray(objectness_ignore(
        jnp.asarray(raw), jnp.asarray(t[:, :, 1:6] * [IMG, IMG, IMG, IMG, 1]),
        spec, rotated=True))[0]

    # independent numpy decode + Sutherland-Hodgman IoU
    anchors_wh, anchor_angles = head_anchors(spec)
    p = raw.reshape(g, g, spec.na, spec.no)
    want = np.zeros((g, g, spec.na), bool)
    for gy in range(g):
        for gx in range(g):
            for a in range(spec.na):
                tx, ty, tw, th_, tth = p[gy, gx, a, :5]
                sig = lambda z: 1 / (1 + np.exp(-z))
                bx = (sig(tx) + gx) * spec.stride
                by = (sig(ty) + gy) * spec.stride
                bw = anchors_wh[a, 0] * np.exp(np.clip(tw, -8, 8))
                bh = anchors_wh[a, 1] * np.exp(np.clip(th_, -8, 8))
                bth = anchor_angles[a] + ANGLE_RANGE * np.tanh(tth)
                box = np.array([bx, by, bw, bh, bth])
                best = max(skew_iou_np(box, gtb) for gtb in gt_px[:2])
                want[gy, gx, a] = best > spec.ignore_thresh
    assert want.sum() > 0, "test setup: no cell exceeds ignore_thresh"
    np.testing.assert_array_equal(got, want)


def test_ignored_predictions_do_not_affect_obj_loss():
    """Flipping the obj logit of an ignored (high-IoU, non-positive)
    prediction must leave the obj component unchanged, while a genuine
    negative's logit must change it."""
    from rotate_yolov3_tpu.train.loss import objectness_ignore

    spec = _spec(ignore=0.4)
    g = IMG // spec.stride
    t, v = _gt(cx=20, cy=20, w=30, h=28, th=0.3)
    out = build_targets_head(t, v, spec, IMG, iou_t=0.2)

    raw = np.zeros((1, g, g, spec.na, spec.no), np.float32)
    gt_px = np.asarray(t[0, :, 1:6]) * [IMG, IMG, IMG, IMG, 1]
    ign = np.asarray(objectness_ignore(
        jnp.asarray(raw.reshape(1, g, g, -1)), jnp.asarray(gt_px)[None],
        spec))[0]
    pos = np.asarray(out.obj_target[0]) > 0
    ign_neg = ign & ~pos
    true_neg = ~ign & ~pos
    assert ign_neg.sum() > 0 and true_neg.sum() > 0

    def obj_loss(r):
        _, comp = compute_loss([jnp.asarray(r.reshape(1, g, g, -1))],
                               t, v, [spec], IMG)
        return float(comp["obj"])

    base = obj_loss(raw)
    r2 = raw.copy()
    iy, ix, ia = np.argwhere(ign_neg)[0]
    r2[0, iy, ix, ia, 5] = 6.0           # ignored: no effect
    assert obj_loss(r2) == pytest.approx(base, abs=1e-7)
    r3 = raw.copy()
    iy, ix, ia = np.argwhere(true_neg)[0]
    r3[0, iy, ix, ia, 5] = 6.0           # real negative: penalised
    assert obj_loss(r3) > base + 1e-4


def _raw_for(spec, b=1):
    g = IMG // spec.stride
    return jnp.zeros((b, g, g, spec.na * spec.no), jnp.float32)


def test_loss_components_finite_and_positive():
    spec = _spec()
    t, v = _gt(cx=20, cy=20, w=16, h=8, th=0.3)
    total, comp = compute_loss([_raw_for(spec)], t, v, [spec], IMG)
    assert np.isfinite(float(total)) and float(total) > 0
    for k in ("xy", "wh", "angle", "siou", "cls", "obj", "total"):
        assert k in comp and np.isfinite(float(comp[k]))


def test_loss_zero_for_perfect_prediction():
    """Constructing raw logits that decode exactly to the GT drives the box
    terms to ~0 (obj/cls BCE can't reach exactly 0 with finite logits)."""
    spec = _spec()
    gt_cx, gt_cy, w, h, th = 20.0, 20.0, 16.0, 8.0, 0.1
    t, v = _gt(gt_cx, gt_cy, w, h, th)
    g = IMG // spec.stride
    raw = np.zeros((1, g, g, spec.na, spec.no), np.float32)
    raw[..., 5] = -10.0       # confident "no object" everywhere else
    gi, gj = int(gt_cx // 8), int(gt_cy // 8)
    # best anchor: wh (16,8) angle 0 -> index 0
    tx, ty = gt_cx / 8 - gi, gt_cy / 8 - gj
    logit = lambda p: math.log(p / (1 - p))
    inv_tanh = 0.5 * math.log((1 + th / ANGLE_RANGE)
                              / (1 - th / ANGLE_RANGE))
    raw[0, gj, gi, 0] = [logit(tx), logit(ty), 0.0, 0.0, inv_tanh,
                         10.0, 10.0]
    total, comp = compute_loss([jnp.asarray(raw.reshape(1, g, g, -1))],
                               t, v, [spec], IMG)
    assert float(comp["xy"]) < 1e-6
    assert float(comp["wh"]) < 1e-6
    assert float(comp["angle"]) < 1e-6
    assert float(comp["siou"]) < 0.02      # exact IoU ~1
    assert float(comp["cls"]) < 1e-3
    assert float(comp["obj"]) < 0.05


def test_loss_gradient_descends():
    spec = _spec()
    t, v = _gt(cx=20, cy=20, w=20, h=10, th=0.4)
    g = IMG // spec.stride
    raw0 = jax.random.normal(jax.random.PRNGKey(0),
                             (1, g, g, spec.na * spec.no)) * 0.1

    def loss_fn(raw):
        return compute_loss([raw], t, v, [spec], IMG)[0]

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    raw = raw0
    l0, _ = grad_fn(raw)
    for _ in range(40):
        l, dg = grad_fn(raw)
        assert np.isfinite(float(l))
        raw = raw - 0.5 * dg
    l1, _ = grad_fn(raw)
    assert float(l1) < 0.5 * float(l0)


def test_loss_multiclass_cls_term():
    spec = _spec(nc=5)
    t, v = _gt(cx=20, cy=20, w=16, h=8, th=0.0, cls=3)
    total, comp = compute_loss([_raw_for(spec)], t, v, [spec], IMG)
    assert float(comp["cls"]) > 0
    g = jax.grad(lambda r: compute_loss([r], t, v, [spec], IMG)[0])(
        _raw_for(spec))
    assert np.all(np.isfinite(np.asarray(g)))


def test_loss_batch_with_empty_image():
    """An image with zero GT must not produce NaNs (div-by-zero guards)."""
    spec = _spec()
    t = jnp.zeros((2, 4, 6), jnp.float32)
    t = t.at[0, 0].set(jnp.asarray([0, 0.3, 0.3, 0.25, 0.12, 0.2]))
    v = jnp.zeros((2, 4), bool).at[0, 0].set(True)
    raw = _raw_for(spec, b=2)
    total, comp = compute_loss([raw], t, v, [spec], IMG)
    assert np.isfinite(float(total))
    g = jax.grad(lambda r: compute_loss([r], t, v, [spec], IMG)[0])(raw)
    assert np.all(np.isfinite(np.asarray(g)))


def test_objectness_ignore_axis_aligned_default_matches_oracle():
    """Default ignore semantics = darknet box_iou: axis-aligned
    (cx, cy, w, h) IoU of the decoded prediction vs GT, theta ignored —
    cross-checked against an independent numpy re-implementation."""
    from rotate_yolov3_tpu.models.yolo_head import (ANGLE_RANGE,
                                                    head_anchors)
    from rotate_yolov3_tpu.train.loss import objectness_ignore

    spec = _spec(ignore=0.4)
    g = IMG // spec.stride
    rng = np.random.default_rng(1)
    raw = rng.normal(0, 0.7, (1, g, g, spec.na * spec.no)).astype(np.float32)
    t = np.zeros((1, 4, 6), np.float32)
    t[0, 0] = [0, 20 / IMG, 20 / IMG, 18 / IMG, 9 / IMG, 0.2]
    t[0, 1] = [0, 44 / IMG, 40 / IMG, 34 / IMG, 30 / IMG, -0.5]
    gt_px = t[0, :, 1:6].copy()
    gt_px[:, :4] *= IMG

    got = np.asarray(objectness_ignore(
        jnp.asarray(raw), jnp.asarray(t[:, :, 1:6] * [IMG, IMG, IMG, IMG, 1]),
        spec))[0]

    def aabb_iou(b1, b2):
        lo = np.maximum(b1[:2] - b1[2:4] / 2, b2[:2] - b2[2:4] / 2)
        hi = np.minimum(b1[:2] + b1[2:4] / 2, b2[:2] + b2[2:4] / 2)
        wh = np.maximum(hi - lo, 0.0)
        inter = wh[0] * wh[1]
        return inter / (b1[2] * b1[3] + b2[2] * b2[3] - inter + 1e-9)

    anchors_wh, anchor_angles = head_anchors(spec)
    p = raw.reshape(g, g, spec.na, spec.no)
    want = np.zeros((g, g, spec.na), bool)
    sig = lambda z: 1 / (1 + np.exp(-z))
    for gy in range(g):
        for gx in range(g):
            for a in range(spec.na):
                tx, ty, tw, th_, _ = p[gy, gx, a, :5]
                box = np.array([
                    (sig(tx) + gx) * spec.stride,
                    (sig(ty) + gy) * spec.stride,
                    anchors_wh[a, 0] * np.exp(np.clip(tw, -8, 8)),
                    anchors_wh[a, 1] * np.exp(np.clip(th_, -8, 8))])
                best = max(aabb_iou(box, gtb[:4]) for gtb in gt_px[:2])
                want[gy, gx, a] = best > spec.ignore_thresh
    assert want.sum() > 0
    np.testing.assert_array_equal(got, want)
