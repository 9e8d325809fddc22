"""Pallas fused splat kernel vs the XLA matmul path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eincm_tpu.ops.splat import events_to_pdf_frame
from eincm_tpu.ops.splat_pallas import events_to_pdf_frame_pallas

SENSOR = (24, 32)


def _rand_events(rng, n, spread=3.0):
    h, w = SENSOR
    xs = rng.uniform(-spread, w - 1 + spread, n).astype(np.float32)
    ys = rng.uniform(-spread, h - 1 + spread, n).astype(np.float32)
    return jnp.asarray(xs), jnp.asarray(ys)


def test_forward_matches_xla(rng):
    xs, ys = _rand_events(rng, 700)
    a = events_to_pdf_frame_pallas(xs, ys, SENSOR, 3, True)
    b = events_to_pdf_frame(xs, ys, SENSOR)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_forward_nan_dropped(rng):
    xs, ys = _rand_events(rng, 100)
    xs2 = jnp.concatenate([xs, jnp.array([jnp.nan])])
    ys2 = jnp.concatenate([ys, jnp.array([5.0])])
    a = events_to_pdf_frame_pallas(xs2, ys2, SENSOR, 3, True)
    b = events_to_pdf_frame_pallas(xs, ys, SENSOR, 3, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_backward_matches_xla(rng):
    xs, ys = _rand_events(rng, 300, spread=0.0)
    cot = jnp.asarray(
        rng.normal(0, 1, SENSOR).astype(np.float32)
    )

    def f_pallas(xs, ys):
        return (events_to_pdf_frame_pallas(xs, ys, SENSOR, 3, True) * cot).sum()

    def f_xla(xs, ys):
        return (events_to_pdf_frame(xs, ys, SENSOR) * cot).sum()

    gx_p, gy_p = jax.grad(f_pallas, argnums=(0, 1))(xs, ys)
    gx_x, gy_x = jax.grad(f_xla, argnums=(0, 1))(xs, ys)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy_p), np.asarray(gy_x), rtol=1e-3, atol=1e-5)


def test_multi_chunk(rng):
    xs, ys = _rand_events(rng, 2500)  # > 2 chunks of 1024
    a = events_to_pdf_frame_pallas(xs, ys, SENSOR, 3, True)
    b = events_to_pdf_frame(xs, ys, SENSOR)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
