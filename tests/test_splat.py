"""The MXU one-hot-matmul splat must agree with the scatter-add oracle."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from eincm_tpu.ops.splat import (
    event_counts,
    events_to_pdf_frame,
    events_to_pdf_frame_scatter,
    make_event_mask,
)

SENSOR = (24, 32)


def _rand_events(rng, n, sensor=SENSOR, spread=3.0):
    h, w = sensor
    xs = rng.uniform(-spread, w - 1 + spread, n).astype(np.float32)
    ys = rng.uniform(-spread, h - 1 + spread, n).astype(np.float32)
    return xs, ys


def test_single_event_center_mass():
    # One event at an exact integer coord: 3x3 patch of N(0,I) pdf values.
    xs = jnp.array([5.0])
    ys = jnp.array([7.0])
    frame = events_to_pdf_frame(xs, ys, SENSOR)
    peak = 1.0 / (2.0 * math.pi)
    assert np.isclose(float(frame[7, 5]), peak, rtol=1e-6)
    assert np.isclose(float(frame[7, 6]), peak * math.exp(-0.5), rtol=1e-6)
    assert np.isclose(float(frame[8, 6]), peak * math.exp(-1.0), rtol=1e-6)
    assert float(frame[7, 8]) == 0.0  # outside window
    # total mass = sum of the 3x3 patch
    g = [math.exp(0), 2 * math.exp(-0.5)]
    mass = (g[0] + g[1]) ** 2 / (2 * math.pi)
    assert np.isclose(float(frame.sum()), mass, rtol=1e-5)


def test_matmul_matches_scatter(rng):
    xs, ys = _rand_events(rng, 700)
    a = events_to_pdf_frame(xs, ys, SENSOR, chunk_size=128)
    b = events_to_pdf_frame_scatter(xs, ys, SENSOR)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_out_of_bounds_dropped(rng):
    xs = jnp.array([-10.0, 100.0, 5.0])
    ys = jnp.array([5.0, 5.0, -50.0])
    frame = events_to_pdf_frame(xs, ys, SENSOR)
    assert float(frame.sum()) == 0.0


def test_boundary_partial_drop():
    # Event at the corner: only the in-sensor part of the window lands.
    xs = jnp.array([0.0])
    ys = jnp.array([0.0])
    a = events_to_pdf_frame(xs, ys, SENSOR)
    b = events_to_pdf_frame_scatter(xs, ys, SENSOR)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    assert float(a[0, 0]) > 0


def test_nan_events_dropped(rng):
    xs, ys = _rand_events(rng, 64)
    xs_nan = np.concatenate([xs, [np.nan, 3.0]]).astype(np.float32)
    ys_nan = np.concatenate([ys, [3.0, np.nan]]).astype(np.float32)
    a = events_to_pdf_frame(jnp.asarray(xs_nan), jnp.asarray(ys_nan), SENSOR)
    b = events_to_pdf_frame(jnp.asarray(xs), jnp.asarray(ys), SENSOR)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_chunk_padding_invariance(rng):
    xs, ys = _rand_events(rng, 333)  # not a multiple of any chunk
    a = events_to_pdf_frame(xs, ys, SENSOR, chunk_size=128)
    b = events_to_pdf_frame(xs, ys, SENSOR, chunk_size=512)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_window5(rng):
    xs, ys = _rand_events(rng, 200)
    a = events_to_pdf_frame(xs, ys, SENSOR, window_size=5)
    b = events_to_pdf_frame_scatter(xs, ys, SENSOR, window_size=5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_event_counts_and_mask(rng):
    xs = jnp.array([1.0, 1.0, 2.0, 31.0])
    ys = jnp.array([1.0, 1.0, 3.0, 23.0])
    counts = event_counts(xs, ys, SENSOR)
    assert float(counts[1, 1]) == 2.0
    assert float(counts[3, 2]) == 1.0
    assert float(counts[23, 31]) == 1.0
    assert float(counts.sum()) == 4.0
    mask = make_event_mask(xs, ys, SENSOR)
    assert bool(mask[1, 1]) and bool(mask[3, 2])
    assert not bool(mask[0, 0])


def test_splat_gradient_finite_difference(rng):
    import jax

    xs, ys = _rand_events(rng, 50)
    xs = jnp.asarray(xs)
    ys = jnp.asarray(ys)

    def f(shift):
        frame = events_to_pdf_frame(xs + shift, ys, SENSOR)
        return (frame**2).sum()

    g = jax.grad(f)(0.0)
    eps = 1e-3
    fd = (f(eps) - f(-eps)) / (2 * eps)
    assert np.isclose(float(g), float(fd), rtol=1e-2)


class TestBandedSplat:
    def _sorted_events(self, rng, n=2000, vy=2.0):
        h, w = SENSOR
        ys0 = np.sort(rng.uniform(1, h - 2, n)).astype(np.float32)
        xs = rng.uniform(0, w - 1, n).astype(np.float32)
        # warped rows: sorted base plus bounded displacement
        dts = rng.uniform(0, 1, n).astype(np.float32)
        wy = ys0 - vy * dts
        return jnp.asarray(xs), jnp.asarray(wy)

    def test_matches_standard_when_sorted(self, rng):
        from eincm_tpu.ops.splat import events_to_pdf_frame_banded

        xs, wy = self._sorted_events(rng)
        # band=12 < H=24: genuinely sub-band (chunk row span ~2 + vy 2 + window)
        a = events_to_pdf_frame_banded(xs, wy, SENSOR, band=12, chunk_size=128)
        b = events_to_pdf_frame(xs, wy, SENSOR)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)

    def test_nan_padding(self, rng):
        from eincm_tpu.ops.splat import events_to_pdf_frame_banded

        xs, wy = self._sorted_events(rng, n=300)
        a = events_to_pdf_frame_banded(xs, wy, SENSOR, band=12, chunk_size=128)
        xs2 = jnp.concatenate([xs, jnp.array([jnp.nan])])
        wy2 = jnp.concatenate([wy, jnp.array([jnp.nan])])
        b = events_to_pdf_frame_banded(xs2, wy2, SENSOR, band=12, chunk_size=128)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)

    def test_gradient_matches_standard(self, rng):
        import jax

        from eincm_tpu.ops.splat import events_to_pdf_frame_banded

        xs, wy = self._sorted_events(rng, n=2000)
        cot = jnp.asarray(rng.normal(0, 1, SENSOR).astype(np.float32))

        def f_banded(wy):
            return (events_to_pdf_frame_banded(xs, wy, SENSOR, band=12,
                                               chunk_size=128) * cot).sum()

        def f_std(wy):
            return (events_to_pdf_frame(xs, wy, SENSOR) * cot).sum()

        g_b = jax.grad(f_banded)(wy)
        g_s = jax.grad(f_std)(wy)
        np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_s),
                                   rtol=1e-3, atol=1e-5)

    def test_excessive_displacement_drops(self, rng):
        """Rows beyond the band above a chunk's min warped row are dropped."""
        from eincm_tpu.ops.splat import events_to_pdf_frame_banded

        wy = jnp.asarray(np.array([2.0, 22.0], np.float32))  # span > band=8
        xs = jnp.asarray(np.array([5.0, 5.0], np.float32))
        a = events_to_pdf_frame_banded(xs, wy, SENSOR, band=8, chunk_size=512)
        # first event present, second dropped
        assert float(a[2, 5]) > 0
        assert float(a[22, 5]) == 0.0


def test_wrap_compat_mode(rng):
    """Opt-in wrap mode: texels at coordinate -k land at n-k (reference
    negative-index semantics); default mode drops them."""
    from eincm_tpu.ops.splat import set_splat_wrap_compat

    h, w = SENSOR
    # one event whose rounded coord is 0: the dx=-1/dy=-1 texels go negative
    xs = jnp.array([0.2], jnp.float32)
    ys = jnp.array([0.1], jnp.float32)
    g = lambda q: math.exp(-0.5 * q * q) / math.sqrt(2 * math.pi)

    plain = np.asarray(events_to_pdf_frame(xs, ys, SENSOR))
    assert plain[0, w - 1] == 0 and plain[h - 1, 0] == 0

    set_splat_wrap_compat(True)
    try:
        wrapped = np.asarray(events_to_pdf_frame(xs, ys, SENSOR))
    finally:
        set_splat_wrap_compat(False)
    # column -1 wraps to w-1, row -1 wraps to h-1
    np.testing.assert_allclose(
        wrapped[0, w - 1], g(-1 - 0.2) * g(0 - 0.1), rtol=1e-6)
    np.testing.assert_allclose(
        wrapped[h - 1, 0], g(0 - 0.2) * g(-1 - 0.1), rtol=1e-6)
    np.testing.assert_allclose(
        wrapped[h - 1, w - 1], g(-1 - 0.2) * g(-1 - 0.1), rtol=1e-6)
    # in-sensor mass identical to the plain mode
    np.testing.assert_allclose(wrapped[:3, :3], plain[:3, :3], rtol=1e-6)


class TestBandedSentinelAnchor:
    def test_sentinel_padding_does_not_pin_band(self, rng):
        """Regression: a chunk mixing real events with finite far-off-sensor
        padding sentinels (-1e4, models/loss.py _sanitize_events) used to
        anchor its band at row 0 via nanmin, dropping the chunk's in-sensor
        mass. The anchor must consider in-sensor rows only."""
        from eincm_tpu.ops.splat import (
            events_to_pdf_frame_banded,
            events_to_pdf_frame_scatter,
        )

        H, W = 64, 48
        n = 1000  # not a multiple of chunk_size -> a straddling mixed chunk
        ys = np.sort(rng.uniform(0, H - 1, n)).astype(np.float32)
        xs = rng.uniform(0, W - 1, n).astype(np.float32)
        pad = np.full(128 - (n % 128), -1e4, np.float32)
        jx = jnp.asarray(np.concatenate([xs, pad]))
        jy = jnp.asarray(np.concatenate([ys, pad]))
        a = events_to_pdf_frame_banded(jx, jy, (H, W), band=16, chunk_size=128)
        b = events_to_pdf_frame_scatter(jnp.asarray(xs), jnp.asarray(ys), (H, W))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
