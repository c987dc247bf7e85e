"""On-device batch augmentation: HSV jitter, flips, rotation-affine, mosaic.

The reference augments on CPU DataLoader workers (SURVEY.md §3.1); the
north-star fuses preprocessing into the same XLA graph (BASELINE.json:
"on-device mosaic/rotation augmentation" for the multi-chip config #5).
Everything here is pure jnp on fixed shapes, vmapped per image with
per-image PRNG keys, and composes inside the jitted train step — the host
loader then only decodes/letterboxes bytes.

Rotated-label handling mirrors ``data.augment``: affine transforms rewrite
(cx, cy) through the matrix and add the rotation angle to theta (image
coords: a CCW image rotation by phi subtracts phi from theta); mosaic
shifts labels per quadrant and re-validates against the crop.

Design notes (TPU):
  * the affine warp is inverse-mapped bilinear sampling via
    ``jax.scipy.ndimage.map_coordinates`` (order=1) — gathers vectorise on
    TPU; shapes are static;
  * mosaic builds a fixed 2Sx2S canvas from 4 batch neighbours and takes a
    ``dynamic_slice`` crop, so the whole op is one fused program with no
    data-dependent shapes;
  * label capacity stays MAX_GT: mosaic candidates (4*G) are sorted
    valid-first and truncated.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config.hyp import Hyp
from ..ops.boxes import normalize_angle


def _rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    d = mx - mn
    safe = jnp.where(d > 0, d, 1.0)
    h = jnp.where(
        mx == r, (g - b) / safe % 6.0,
        jnp.where(mx == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0))
    h = jnp.where(d > 0, h / 6.0, 0.0)
    s = jnp.where(mx > 0, d / jnp.where(mx > 0, mx, 1.0), 0.0)
    return jnp.stack([h, s, mx], axis=-1)


def _hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def hsv_jitter(key, img: jnp.ndarray, h_gain: float, s_gain: float,
               v_gain: float) -> jnp.ndarray:
    """Random HSV gains on one (H, W, 3) float image in [0, 1].

    DOCUMENTED divergence from the host path (``data.augment.augment_hsv``,
    which reproduces cv2's uint8 LUT math): hue here is multiplied in
    continuous [0, 1) space with mod-1 wrap, where cv2 multiplies the
    0..179 integer hue channel through a LUT with mod-180 wrap. Same
    distribution family (multiplicative hue jitter with circular wrap),
    different quantisation — s/v match to within uint8 rounding. Pinned by
    tests/test_augment_device.py::test_hsv_device_vs_host_distribution;
    kept divergent because an exact LUT emulation would quantise the
    device path to uint8 mid-graph for no training benefit.
    """
    r = jax.random.uniform(key, (3,), minval=-1.0, maxval=1.0)
    gains = 1.0 + r * jnp.asarray([h_gain, s_gain, v_gain])
    hsv = _rgb_to_hsv(img)
    h = (hsv[..., 0] * gains[0]) % 1.0
    s = jnp.clip(hsv[..., 1] * gains[1], 0.0, 1.0)
    v = jnp.clip(hsv[..., 2] * gains[2], 0.0, 1.0)
    return _hsv_to_rgb(jnp.stack([h, s, v], axis=-1))


def flip_lr(do_flip, img: jnp.ndarray, targets: jnp.ndarray
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Conditional horizontal flip of one image + normalized labels."""
    fimg = jnp.where(do_flip, img[:, ::-1], img)
    fx = jnp.where(do_flip & (targets[:, 3] > 0), 1.0 - targets[:, 1],
                   targets[:, 1])
    fth = jnp.where(do_flip, -targets[:, 5], targets[:, 5])
    return fimg, targets.at[:, 1].set(fx).at[:, 5].set(fth)


def rotate_scale(key, img: jnp.ndarray, targets: jnp.ndarray,
                 valid: jnp.ndarray, degrees: float, scale: float,
                 pad_value: float = 0.5
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Random rotation+scale about the image center (one image),
    gather-based (exact bilinear inverse map).

    Reference-quality path for CPU/small images. On this TPU backend
    per-pixel gathers cost ~70ms per 608^2 image — training uses
    ``rotate_shear`` instead (gather-free; see below).
    """
    size = img.shape[0]
    k1, k2 = jax.random.split(key)
    phi = jax.random.uniform(k1, (), minval=-degrees, maxval=degrees) \
        * (math.pi / 180.0)
    s = jax.random.uniform(k2, (), minval=1.0 - scale, maxval=1.0 + scale)

    # inverse map: output pixel -> source pixel (rotate -phi, scale 1/s)
    c = (size - 1) / 2.0
    cos, sin = jnp.cos(phi), jnp.sin(phi)
    yy = jax.lax.broadcasted_iota(jnp.float32, (size, size), 0) - c
    xx = jax.lax.broadcasted_iota(jnp.float32, (size, size), 1) - c
    src_x = (cos * xx + sin * yy) / s + c
    src_y = (-sin * xx + cos * yy) / s + c
    out = jnp.stack([
        jax.scipy.ndimage.map_coordinates(
            img[..., ch], [src_y, src_x], order=1, mode="constant",
            cval=pad_value)
        for ch in range(img.shape[-1])], axis=-1)

    new_t, new_valid = _rotate_labels(targets, valid, phi, s, size)
    return out, new_t, new_valid


def _rotate_labels(targets, valid, phi, s, size):
    """Forward-map labels under rotate(phi)+scale(s) about the center."""
    c = (size - 1) / 2.0
    cos, sin = jnp.cos(phi), jnp.sin(phi)
    x = targets[:, 1] * size - c
    y = targets[:, 2] * size - c
    nx = (cos * x - sin * y) * s + c
    ny = (sin * x + cos * y) * s + c
    nw = targets[:, 3] * s
    nh = targets[:, 4] * s
    nth = normalize_angle(targets[:, 5] + phi)
    new_t = jnp.stack([targets[:, 0], nx / size, ny / size, nw, nh, nth],
                      axis=1)
    inside = ((nx / size > 0.0) & (nx / size < 1.0)
              & (ny / size > 0.0) & (ny / size < 1.0))
    new_valid = valid & inside
    return jnp.where(new_valid[:, None], new_t, 0.0), new_valid


# ---------------------------------------------------------------------------
# Gather-free rotation: three-shear decomposition with bit-decomposed rolls.
#
# Generic gathers cost ~40 cycles/element on this TPU backend (~300ms for a
# bs8 608^2 batch — measured), so the warp is built entirely from full-array
# vector ops: R(phi) = ShearX(a) . ShearY(b) . ShearX(a) with
# a = -tan(phi/2), b = sin(phi). A shear's shift is constant along the
# shifted axis, so "shift row y by f_y" decomposes into log2(range) STATIC
# jnp.roll's, each applied per-row through an elementwise select on the
# shift's binary digits. Fractional parts are a 2-tap lerp (one more roll).
# Out-of-frame pixels are masked to the pad value from exact source bounds.
# The roll budget (bit count) is derived STATICALLY from the image size and
# the max rotation magnitude, so any (size, degrees) combination is covered
# by construction — a fixed budget would silently wrap large shifts.
# ---------------------------------------------------------------------------


def _rotation_shift_bits(size: int, degrees: float) -> int:
    """Static roll budget covering the worst-case shear shift.

    ``_shear`` represents floor(shift) + bias in ``bits`` binary digits
    (bias = 2^(bits-1)); coverage needs bias >= max|shift| + 1. For a
    rotation by |phi| <= degrees about the center of a size^2 image the
    shear shifts are bounded by max(tan(phi/2), sin(phi)) * (size-1)/2.
    The shear path only ever sees residual angles <= 45 deg (the quadrant
    part of a larger rotation is an exact rot90, see ``_warp_rotate``).
    """
    if not 0.0 <= degrees <= 45.0:
        raise ValueError(
            f"shear residual must be within [0, 45] deg, got {degrees}")
    rad = math.radians(degrees)
    max_shift = max(math.tan(rad / 2.0), math.sin(rad)) * (size - 1) / 2.0
    return max(1, math.ceil(math.log2(max_shift + 2.0)) + 1)


def _shear(img: jnp.ndarray, shift: jnp.ndarray, axis: int,
           pad_value: float, bits: int) -> jnp.ndarray:
    """Shift img (H, W, C) along ``axis`` by per-orthogonal-line amounts.

    shift: (S,) float — shift[i] applied to line i of the OTHER axis;
    |shift| must be < 2^(bits-1) - 1 (see ``_rotation_shift_bits``).
    out[y, x] = in[y, x - shift[y]] for axis=1 (bilinear, edge-padded).
    """
    size = img.shape[axis]
    bias = 1 << (bits - 1)
    f = jnp.floor(shift)
    t = (shift - f).astype(img.dtype)                    # (S,)
    fi = f.astype(jnp.int32) + bias                      # non-negative

    if axis == 1:
        t_b = t[:, None, None]
        def line_mask(bit):                              # (S,1,1) bool
            return ((fi >> bit) & 1).astype(bool)[:, None, None]
        pos = jnp.arange(img.shape[1], dtype=jnp.float32)[None, :]
        src = pos - shift[:, None]                       # (S, W)
        inb = ((src >= 0) & (src <= size - 1))[:, :, None]
    else:
        t_b = t[None, :, None]
        def line_mask(bit):
            return ((fi >> bit) & 1).astype(bool)[None, :, None]
        pos = jnp.arange(img.shape[0], dtype=jnp.float32)[:, None]
        src = pos - shift[None, :]                       # (H, S)
        inb = ((src >= 0) & (src <= size - 1))[:, :, None]

    # integer part: out[x] = in[x - floor(shift)] — roll content by
    # +floor(shift) = -bias + fi, realised as one -bias roll then +2^k per
    # set bit of fi (per line, via elementwise select)
    x = jnp.roll(img, -bias, axis=axis)
    for bit in range(bits):
        x = jnp.where(line_mask(bit), jnp.roll(x, 1 << bit, axis=axis), x)
    # fractional part: lerp with in[x - floor - 1] = roll(+1) of the above
    x_next = jnp.roll(x, 1, axis=axis)
    out = x * (1.0 - t_b) + x_next * t_b
    return jnp.where(inb, out, jnp.asarray(pad_value, img.dtype))


def rotate_shear(key, img: jnp.ndarray, targets: jnp.ndarray,
                 valid: jnp.ndarray, degrees: float,
                 pad_value: float = 0.5
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Random rotation about the image center via three shears (one image).

    Gather-free TPU path (see module comment above). Rotation only — scale
    jitter comes from the mosaic crop in ``augment_batch``. Labels get the
    exact rotation transform.
    """
    size = img.shape[0]
    phi = jax.random.uniform(key, (), minval=-degrees, maxval=degrees) \
        * (math.pi / 180.0)
    # the shear stage only ever sees the <=45-deg residual of phi (the
    # quadrant part is an exact rot90 inside _warp_rotate), so the static
    # roll budget is capped at 45 deg regardless of the requested range
    bits = _rotation_shift_bits(size, min(degrees, 45.0))
    out = _warp_rotate(img, phi, bits, pad_value)
    new_t, new_valid = _rotate_labels(targets, valid, phi,
                                      jnp.float32(1.0), size)
    return out, new_t, new_valid


def _warp_rotate(img: jnp.ndarray, phi: jnp.ndarray, bits: int,
                 pad_value: float) -> jnp.ndarray:
    """Rotate one (S, S, C) image by ``phi`` radians about its center.

    phi is decomposed into an exact quadrant turn (rot90 — pure layout, no
    resampling, no frame clipping) plus a residual in [-45, 45] deg realised
    by three shears. Keeping the shear part <= 45 deg both bounds the roll
    budget and bounds the content that temporarily leaves the fixed canvas
    between shears (the corner regions it can clip are ones a true rotation
    evicts anyway).
    """
    size = img.shape[0]
    half_pi = math.pi / 2.0
    k = jnp.round(phi / half_pi).astype(jnp.int32)
    r = phi - k.astype(jnp.float32) * half_pi            # [-45, 45] deg
    # content rotation by k*90deg in image space (y down): +90deg maps
    # (x, y) -> (-y, x), i.e. B[i, j] = A[S-1-j, i] = jnp.rot90(A, 3)
    img = jax.lax.switch(k % 4, [
        lambda a: a,
        lambda a: jnp.rot90(a, 3),
        lambda a: jnp.rot90(a, 2),
        lambda a: jnp.rot90(a, 1),
    ], img)
    c = (size - 1) / 2.0
    lines = jnp.arange(size, dtype=jnp.float32) - c
    # image-space (y down) rotation by r == math rotation by -r;
    # shears below realise the inverse warp so content rotates by +r
    a = -jnp.tan(r / 2.0)
    b = jnp.sin(r)
    out = _shear(img, a * lines, axis=1, pad_value=pad_value, bits=bits)
    out = _shear(out, b * lines, axis=0, pad_value=pad_value, bits=bits)
    return _shear(out, a * lines, axis=1, pad_value=pad_value, bits=bits)


# ---------------------------------------------------------------------------
# Gather-free scale + translate: separable MXU matmul resampling.
#
# An isotropic scale about the center plus a translation is SEPARABLE per
# axis: out[y, x] = in[sy(y), sx(x)] with sy/sx affine in one coordinate.
# A 1D affine resample is a linear map, i.e. a matmul with the 2-tap
# bilinear matrix R[i, j] = max(0, 1 - |src_i - j|) — so the whole warp is
# two (S, S) x (S, S·C) matmuls that run on the MXU (~2.7 GFLOP at 608²,
# tens of µs) instead of per-pixel gathers (~40 cycles/element on this
# backend, CLAUDE.md rule 5). Out-of-frame regions blend to the pad value
# through the row coverage (1 - Σ_j R[i, j]), per axis, which composes
# correctly across the two passes.
# ---------------------------------------------------------------------------


def _resample_matrix(size: int, s: jnp.ndarray, shift: jnp.ndarray):
    """(S, S) bilinear resample matrix + (S,) coverage for the 1D affine
    inverse map src(i) = (i - c - shift) / s + c (scale s about the
    center, then shift pixels of translation)."""
    c = (size - 1) / 2.0
    idx = jnp.arange(size, dtype=jnp.float32)
    src = (idx - c - shift) / s + c                   # (S,)
    d = jnp.abs(src[:, None] - idx[None, :])          # (S, S)
    r = jnp.maximum(0.0, 1.0 - d)
    cov = jnp.sum(r, axis=1)
    return r, cov


def scale_translate(key, img: jnp.ndarray, targets: jnp.ndarray,
                    valid: jnp.ndarray, scale: float, translate: float,
                    pad_value: float = 0.5
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Random isotropic scale + translation of one (S, S, C) image via the
    separable matmul resample (exact bilinear; no gathers).

    Completes the on-device path to the reference ``random_affine``'s
    parameter set (rotation + scale + translation, SURVEY.md §2
    "augmentation"): composed after ``rotate_shear`` the full affine group
    acts, with ``hyp.scale`` / ``hyp.translate`` semantics matching the
    host path (scale factor U(1-s, 1+s), shift U(-t, t)·S pixels per
    axis). Labels get the exact transform: centers mapped affinely, w/h
    scaled, theta untouched (isotropic scale + translation preserve
    orientation).
    """
    size = img.shape[0]
    k1, k2 = jax.random.split(key)
    s = jax.random.uniform(k1, (), minval=1.0 - scale, maxval=1.0 + scale)
    shift = jax.random.uniform(k2, (2,), minval=-translate,
                               maxval=translate) * size      # (sx, sy) px

    ry, covy = _resample_matrix(size, s, shift[1])
    rx, covx = _resample_matrix(size, s, shift[0])
    # y pass: out[i, x, c] = sum_j ry[i, j] img[j, x, c] (+ pad fill)
    tmp = jnp.einsum("ij,jxc->ixc", ry, img)
    tmp = tmp + (1.0 - covy)[:, None, None] * pad_value
    # x pass on the y-resampled image
    out = jnp.einsum("xj,ijc->ixc", rx, tmp)
    out = out + (1.0 - covx)[None, :, None] * pad_value

    c = (size - 1) / 2.0
    nx = (targets[:, 1] * size - c) * s + c + shift[0]
    ny = (targets[:, 2] * size - c) * s + c + shift[1]
    nw = targets[:, 3] * s
    nh = targets[:, 4] * s
    new_t = jnp.stack([targets[:, 0], nx / size, ny / size, nw, nh,
                       targets[:, 5]], axis=1)
    inside = ((nx / size > 0.0) & (nx / size < 1.0)
              & (ny / size > 0.0) & (ny / size < 1.0))
    new_valid = valid & inside
    return out, jnp.where(new_valid[:, None], new_t, 0.0), new_valid


def mosaic(key, imgs: jnp.ndarray, targets: jnp.ndarray, valid: jnp.ndarray,
           pad_value: float = 0.5
           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched 4-image mosaic with fixed shapes.

    For image i the partners are (i+1, i+2, i+3) mod B. A 2Sx2S canvas of
    the four images is cropped back to SxS at a random offset; labels from
    all four are shifted into crop coordinates, re-validated, and truncated
    back to MAX_GT (valid-first).
    """
    b, s = imgs.shape[0], imgs.shape[1]
    g = targets.shape[1]

    def one(key, i):
        idx = jnp.stack([i, (i + 1) % b, (i + 2) % b, (i + 3) % b])
        quad = imgs[idx]                     # (4, S, S, C)
        canvas = jnp.concatenate([
            jnp.concatenate([quad[0], quad[1]], axis=1),
            jnp.concatenate([quad[2], quad[3]], axis=1)], axis=0)  # (2S,2S,C)
        off = jax.random.randint(key, (2,), 0, s + 1)   # (oy, ox)
        crop = jax.lax.dynamic_slice(
            canvas, (off[0], off[1], 0), (s, s, canvas.shape[-1]))

        t4 = targets[idx]                    # (4, G, 6)
        v4 = valid[idx]
        qoff = jnp.asarray([[0, 0], [1, 0], [0, 1], [1, 1]], jnp.float32)
        # pixel coords on the canvas
        cx = (t4[..., 1] + qoff[:, 0:1]) * s - off[1]
        cy = (t4[..., 2] + qoff[:, 1:2]) * s - off[0]
        nt = jnp.stack([t4[..., 0], cx / s, cy / s,
                        t4[..., 3], t4[..., 4], t4[..., 5]], axis=-1)
        inside = ((cx / s > 0.0) & (cx / s < 1.0)
                  & (cy / s > 0.0) & (cy / s < 1.0))
        nv = (v4 & inside).reshape(4 * g)
        nt = nt.reshape(4 * g, 6)
        # keep MAX_GT, valid first (stable order)
        order = jnp.argsort(~nv, stable=True)
        nt = jnp.where(nv[order][:g, None], nt[order][:g], 0.0)
        return crop, nt, nv[order][:g]

    keys = jax.random.split(key, b)
    return jax.vmap(one)(keys, jnp.arange(b))


def augment_batch(key, imgs: jnp.ndarray, targets: jnp.ndarray,
                  valid: jnp.ndarray, hyp: Hyp = None,
                  use_mosaic: bool = True, use_hsv: bool = True,
                  use_flip: bool = True, use_rotate: bool = True,
                  use_scale_translate: bool = True
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full on-device augmentation for a (B, S, S, 3) float[0,1] batch.

    Composes mosaic -> rotation -> scale/translate -> flip -> HSV inside
    one jit — the full reference ``random_affine`` parameter set
    (rotation + scale + translation act via hyp.degrees/scale/translate).
    Returns (imgs, targets, valid) with the same shapes.
    """
    hyp = hyp or Hyp()
    b = imgs.shape[0]
    k_mosaic, k_rot, k_st, k_flip, k_hsv = jax.random.split(key, 5)

    if use_mosaic:
        imgs, targets, valid = mosaic(k_mosaic, imgs, targets, valid)
    if use_rotate:
        # gather-free shear rotation (see rotate_shear)
        keys = jax.random.split(k_rot, b)
        imgs, targets, valid = jax.vmap(
            lambda k, im, t, v: rotate_shear(k, im, t, v, hyp.degrees)
        )(keys, imgs, targets, valid)
    if use_scale_translate and (hyp.scale > 0 or hyp.translate > 0):
        # gather-free separable matmul resample (see scale_translate)
        keys = jax.random.split(k_st, b)
        imgs, targets, valid = jax.vmap(
            lambda k, im, t, v: scale_translate(k, im, t, v, hyp.scale,
                                                hyp.translate)
        )(keys, imgs, targets, valid)
    if use_flip:
        flips = jax.random.bernoulli(k_flip, 0.5, (b,))
        imgs, targets = jax.vmap(flip_lr)(flips, imgs, targets)
    if use_hsv:
        keys = jax.random.split(k_hsv, b)
        imgs = jax.vmap(
            lambda k, im: hsv_jitter(k, im, hyp.hsv_h, hyp.hsv_s, hyp.hsv_v)
        )(keys, imgs)
    return imgs, targets, valid
