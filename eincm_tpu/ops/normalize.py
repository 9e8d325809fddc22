"""Array normalization and tiling helpers.

Reference: src/utils/img_utils.py:24-25 (`normalize_to_unit_range`),
src/utils/img_utils.py:105-120 (`extract_tiles`).
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

EPSN = sys.float_info.epsilon


def normalize_to_unit_range(arr: jax.Array) -> jax.Array:
    """Min-max normalize to [0, 1] with an epsilon-guarded denominator."""
    lo = arr.min()
    hi = arr.max()
    return (arr - lo) / (hi - lo + jnp.asarray(EPSN, arr.dtype))


def extract_tiles(arr: jax.Array, tile_h: int, tile_w: int) -> jax.Array:
    """Split a 2-D array into non-overlapping tiles, row-major order.

    Remainder rows/columns that do not fill a whole tile are discarded,
    matching the reference's integer-division tiling
    (src/utils/img_utils.py:105-120).

    Returns:
        (n_tiles, tile_h, tile_w).
    """
    h, w = arr.shape
    nh, nw = h // tile_h, w // tile_w
    arr = arr[: nh * tile_h, : nw * tile_w]
    tiles = arr.reshape(nh, tile_h, nw, tile_w)
    return tiles.transpose(0, 2, 1, 3).reshape(nh * nw, tile_h, tile_w)
