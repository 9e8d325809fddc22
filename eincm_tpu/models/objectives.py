"""Contrast / correlation / collapse objectives, regularizers, and FWL.

Functional ports of the reference's objective zoo, computed on fixed-shape
device arrays:

- contrast:     src/eincm/objectives/contrast_objectives.py:13-87
- correlation:  src/eincm/objectives/correlation_objectives.py:12-130
- collapse:     src/eincm/objectives/event_collapse_objectives.py:8-19
- regularizers: src/eincm/regularizers.py:14-57
- FWL metric:   src/eincm/contrast_metrics.py:6-18
"""

from __future__ import annotations

import sys
from typing import Tuple

import jax
import jax.numpy as jnp

from eincm_tpu.ops.filters import divergence_filter, scharr_grads
from eincm_tpu.ops.normalize import extract_tiles
from eincm_tpu.ops.splat import event_counts

EPSN = sys.float_info.epsilon


# ---------------------------------------------------------------------------
# Contrast objectives
# ---------------------------------------------------------------------------

def compute_mean_gradient_magnitude(arr: jax.Array) -> jax.Array:
    """Mean squared Scharr gradient magnitude (no sqrt).

    Reference: src/eincm/objectives/contrast_objectives.py:13-26.
    """
    g = scharr_grads(arr)
    return (g[..., 0] ** 2 + g[..., 1] ** 2).mean()


def compute_variance(arr: jax.Array) -> jax.Array:
    """Reference: src/eincm/objectives/contrast_objectives.py:29-39."""
    return jnp.var(arr)


def compute_adaptive_mean_gradient_magnitude(
    arr: jax.Array, tile_size: Tuple[int, int] | None = None
) -> jax.Array:
    """Sum of per-tile mean gradient magnitudes.

    Reference: src/eincm/objectives/contrast_objectives.py:42-63.
    """
    th, tw = tile_size if tile_size is not None else (32, 42)
    tiles = extract_tiles(arr, th, tw)
    return jax.vmap(compute_mean_gradient_magnitude)(tiles).sum()


def compute_adaptive_variance(
    arr: jax.Array, tile_size: Tuple[int, int] | None = None
) -> jax.Array:
    """Sum of per-tile variances.

    Reference: src/eincm/objectives/contrast_objectives.py:66-87.
    """
    th, tw = tile_size if tile_size is not None else (32, 42)
    tiles = extract_tiles(arr, th, tw)
    return jax.vmap(compute_variance)(tiles).sum()


# ---------------------------------------------------------------------------
# Correlation objectives
# ---------------------------------------------------------------------------

def compute_mean_squared_error(arr_1: jax.Array, arr_2: jax.Array) -> jax.Array:
    """Reference: src/eincm/objectives/correlation_objectives.py:12-27."""
    return ((arr_1 - arr_2) ** 2).mean()


def compute_sum_squared_error(arr_1: jax.Array, arr_2: jax.Array) -> jax.Array:
    """Reference: src/eincm/objectives/correlation_objectives.py:30-45."""
    return ((arr_1 - arr_2) ** 2).sum()


def compute_mean_hadamard_product(arr_1: jax.Array, arr_2: jax.Array) -> jax.Array:
    """Reference: src/eincm/objectives/correlation_objectives.py:48-64."""
    return (arr_1 * arr_2).mean()


def compute_sum_hadamard_product(arr_1: jax.Array, arr_2: jax.Array) -> jax.Array:
    """Reference: src/eincm/objectives/correlation_objectives.py:67-83."""
    return (arr_1 * arr_2).sum()


def compute_joint_contrast(arr_1: jax.Array, arr_2: jax.Array) -> jax.Array:
    """Joint-filtering correlation: contrast of the sum image.

    Reference: src/eincm/objectives/correlation_objectives.py:86-102.
    """
    return compute_mean_gradient_magnitude(arr_1 + arr_2)


def compute_adaptive_mean_squared_error(
    arr_1: jax.Array, arr_2: jax.Array, tile_size: Tuple[int, int] | None = None
) -> jax.Array:
    """Sum of per-tile MSEs.

    Reference: src/eincm/objectives/correlation_objectives.py:105-130.
    """
    th, tw = tile_size if tile_size is not None else (32, 42)
    t1 = extract_tiles(arr_1, th, tw)
    t2 = extract_tiles(arr_2, th, tw)
    return jax.vmap(compute_mean_squared_error)(t1, t2).sum()


# ---------------------------------------------------------------------------
# Event-collapse objective
# ---------------------------------------------------------------------------

def iwe_divergence(iwe: jax.Array) -> jax.Array:
    """Mean |divergence| of the IWE gradient field (anti-collapse).

    Reference: src/eincm/objectives/event_collapse_objectives.py:8-19.
    """
    g = scharr_grads(iwe)  # (H, W, 2)
    div_x = divergence_filter(g[..., 0])
    div_y = divergence_filter(g[..., 1])
    return jnp.abs(div_x + div_y).mean()


# ---------------------------------------------------------------------------
# Regularizers
# ---------------------------------------------------------------------------

def per_pix_theta_to_flow(
    theta: jax.Array, xs: jax.Array, ys: jax.Array, ts: jax.Array
) -> jax.Array:
    """Flow displacement field: theta masked to event pixels, dt == 1.

    The reference scatter-writes theta[y, x] * 1 at every event pixel
    (src/utils/theta_utils.py:40-73). Since the written value is the local
    theta itself, this equals theta multiplied by the event-presence mask —
    which we compute scatter-free via one-hot matmul counts.
    """
    mask = event_counts(xs, ys, (theta.shape[0], theta.shape[1])) > 0
    return theta * mask[..., None].astype(theta.dtype)


def per_pix_total_variation(
    theta: jax.Array, xs: jax.Array, ys: jax.Array, ts: jax.Array
) -> jax.Array:
    """L1 total variation of the event-masked flow field, normalized by the
    count of pixels with any nonzero flow gradient.

    Reference: src/eincm/regularizers.py:14-38.
    """
    flow = per_pix_theta_to_flow(theta, xs, ys, ts)
    gx = scharr_grads(flow[..., 0])  # (H, W, 2)
    gy = scharr_grads(flow[..., 1])  # (H, W, 2)

    nz = (
        (jnp.abs(gx[..., 0]) > 0)
        | (jnp.abs(gx[..., 1]) > 0)
        | (jnp.abs(gy[..., 0]) > 0)
        | (jnp.abs(gy[..., 1]) > 0)
    )
    l1 = 0.25 * (
        jnp.abs(gx[..., 0]) + jnp.abs(gx[..., 1])
        + jnp.abs(gy[..., 0]) + jnp.abs(gy[..., 1])
    )
    return l1.sum() / (nz.sum() + jnp.asarray(EPSN, theta.dtype))


def per_pix_theta_divergence(theta: jax.Array) -> jax.Array:
    """Mean |divergence| of the theta gradient fields.

    Reference: src/eincm/regularizers.py:41-57.
    """
    gx = scharr_grads(theta[..., 0])
    gy = scharr_grads(theta[..., 1])
    div = (
        divergence_filter(gx[..., 0])
        + divergence_filter(gx[..., 1])
        + divergence_filter(gy[..., 0])
        + divergence_filter(gy[..., 1])
    )
    return jnp.abs(div).mean()


# ---------------------------------------------------------------------------
# Contrast metric (FWL)
# ---------------------------------------------------------------------------

def compute_fwl(iwe: jax.Array, zero_iwe: jax.Array) -> jax.Array:
    """Flow-Warp-Loss: var(IWE) / var(IUE).

    Reference: src/eincm/contrast_metrics.py:6-18.
    """
    return jnp.var(iwe) / jnp.var(zero_iwe)
