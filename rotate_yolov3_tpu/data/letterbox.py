"""Letterbox resize: aspect-preserving resize + gray padding to square.

Host-side (numpy/cv2) variant for the CLI file-loading path, matching the
reference's ``utils/datasets.py::letterbox`` contract (SURVEY.md §2
"letterbox"): returns the resized image plus (ratio, pad) for inverse
coordinate mapping. A jnp on-device variant is provided for fused batched
pipelines (BASELINE north_star: preprocessing fused into the XLA graph) —
it assumes a fixed input shape per compile, as XLA requires.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

_PAD_VALUE = 128


def letterbox(img: np.ndarray, new_shape: int = 608,
              color: Tuple[int, int, int] = (_PAD_VALUE,) * 3
              ) -> Tuple[np.ndarray, float, Tuple[float, float]]:
    """Resize HWC uint8 image to (new_shape, new_shape) preserving aspect.

    Returns (letterboxed image, ratio, (pad_x, pad_y)); the inverse map for
    detections is ``ops.boxes.scale_coords_rotated``.
    """
    import cv2

    h, w = img.shape[:2]
    ratio = min(new_shape / h, new_shape / w)
    new_w, new_h = int(round(w * ratio)), int(round(h * ratio))
    if (new_w, new_h) != (w, h):
        img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    pad_x = (new_shape - new_w) / 2
    pad_y = (new_shape - new_h) / 2
    top, bottom = int(round(pad_y - 0.1)), int(round(pad_y + 0.1))
    left, right = int(round(pad_x - 0.1)), int(round(pad_x + 0.1))
    img = cv2.copyMakeBorder(img, top, bottom, left, right,
                             cv2.BORDER_CONSTANT, value=color)
    return img, ratio, (left, top)


def letterbox_jax(img, new_shape: int = 608):
    """On-device letterbox for fixed-shape batched images.

    Args:
      img: (B, H, W, C) float array (any range).
      new_shape: target square size.
    Returns:
      (B, new_shape, new_shape, C) array, ratio (python float),
      (pad_x, pad_y) (python floats) — statically known from the input shape,
      so the inverse mapping stays jit-free.
    """
    import jax
    import jax.numpy as jnp

    b, h, w, c = img.shape
    ratio = min(new_shape / h, new_shape / w)
    new_w, new_h = int(round(w * ratio)), int(round(h * ratio))
    resized = jax.image.resize(img, (b, new_h, new_w, c), method="linear")
    pad_y = (new_shape - new_h) / 2
    pad_x = (new_shape - new_w) / 2
    top, left = int(round(pad_y - 0.1)), int(round(pad_x - 0.1))
    out = jnp.full((b, new_shape, new_shape, c), float(_PAD_VALUE),
                   dtype=img.dtype)
    out = jax.lax.dynamic_update_slice(out, resized, (0, top, left, 0))
    return out, ratio, (left, top)
