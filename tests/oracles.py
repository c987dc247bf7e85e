"""Pure-numpy oracles for geometry tests.

Deliberately implemented with a DIFFERENT algorithm (sequential
Sutherland–Hodgman polygon clipping) than the framework's candidate-point
formulation, so the two act as independent cross-checks — the role shapely
plays in the reference's Python fallback path (SURVEY.md §2 "skew-IoU").
"""

from __future__ import annotations

import numpy as np


def _cross2d(a, b):
    """2-D scalar cross product (np.cross on 2-vectors is deprecated)."""
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def rbox_corners_np(box):
    """(5,) rotated box -> (4, 2) CCW corners. Mirrors ops.boxes.rbox_corners."""
    cx, cy, w, h, th = box
    cos, sin = np.cos(th), np.sin(th)
    local = np.array([[-w, -h], [w, -h], [w, h], [-w, h]]) * 0.5
    rot = np.array([[cos, -sin], [sin, cos]])
    return local @ rot.T + np.array([cx, cy])


def clip_polygon(subject, clip):
    """Sutherland–Hodgman: clip `subject` polygon by convex CCW `clip` poly."""
    output = list(subject)
    n = len(clip)
    for i in range(n):
        a, b = clip[i], clip[(i + 1) % n]
        edge = b - a
        input_list, output = output, []
        if not input_list:
            break
        for j in range(len(input_list)):
            p, q = input_list[j], input_list[(j + 1) % len(input_list)]
            # inside = left of edge (CCW clip polygon)
            p_in = _cross2d(edge, p - a) >= -1e-12
            q_in = _cross2d(edge, q - a) >= -1e-12
            if p_in:
                output.append(p)
            if p_in != q_in:
                d = q - p
                denom = _cross2d(edge, d)
                if abs(denom) > 1e-15:
                    t = _cross2d(edge, a - p) / denom
                    output.append(p + t * d)
    return np.array(output) if output else np.zeros((0, 2))


def polygon_area_np(pts):
    if len(pts) < 3:
        return 0.0
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def skew_iou_np(b1, b2):
    """Exact rotated-box IoU via Sutherland–Hodgman clipping."""
    c1, c2 = rbox_corners_np(np.asarray(b1, float)), rbox_corners_np(
        np.asarray(b2, float))
    inter = polygon_area_np(clip_polygon(c1, c2))
    a1 = b1[2] * b1[3]
    a2 = b2[2] * b2[3]
    union = a1 + a2 - inter
    return inter / union if union > 0 else 0.0


def greedy_rotated_nms_np(boxes, scores, iou_thr):
    """O(n^2) greedy rotated NMS oracle. Returns kept indices (score order)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            if skew_iou_np(boxes[i], boxes[j]) > iou_thr:
                suppressed[j] = True
    return np.array(keep, dtype=int)
