"""Pallas row-gather kernel vs jnp.take_along_axis (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rotate_yolov3_tpu.ops.gather_rows import (gather_rows_auto,
                                               gather_rows_pallas)


def _ref(cells, idx):
    return jnp.take_along_axis(
        cells, jnp.clip(idx, 0, cells.shape[1] - 1)[..., None], axis=1)


@pytest.mark.parametrize("n,c,k", [(7581, 42, 512), (64, 7, 8), (96, 42, 128)])
def test_pallas_gather_matches_xla(n, c, k):
    r = np.random.default_rng(0)
    b = 3
    cells = jnp.asarray(r.normal(size=(b, n, c)).astype(np.float32))
    idx = jnp.asarray(r.integers(0, n, (b, k)).astype(np.int32))
    got = gather_rows_pallas(cells, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(_ref(cells, idx)))


def test_pallas_gather_bf16_and_dup_indices():
    # bf16 uses a 16-row sublane alignment (K must be a multiple of 16)
    r = np.random.default_rng(1)
    cells = jnp.asarray(
        r.normal(size=(2, 40, 42)).astype(np.float32)).astype(jnp.bfloat16)
    # duplicates + boundary rows + out-of-range (clipped like XLA mode=clip)
    idx = jnp.asarray(np.array(
        [[0, 0, 39, 39, 7, 8, 31, 32, 15, 16, 17, 1, 2, 3, 38, 20],
         [5, 5, 5, 5, 0, 39, 41, -1, 9, 9, 12, 33, 25, 24, 23, 6]],
        np.int32))
    got = gather_rows_pallas(cells, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(_ref(cells, idx)))


def test_auto_falls_back_off_tpu():
    # CPU backend: auto must take the XLA path and still match
    r = np.random.default_rng(2)
    cells = jnp.asarray(r.normal(size=(2, 100, 7)).astype(np.float32))
    idx = jnp.asarray(r.integers(0, 100, (2, 16)).astype(np.int32))
    np.testing.assert_array_equal(np.asarray(gather_rows_auto(cells, idx)),
                                  np.asarray(_ref(cells, idx)))
