"""Unit tests for warp, filters, normalize, resize ops."""

import jax
import jax.numpy as jnp
import jax.scipy.signal as jss
import numpy as np
import pytest

from eincm_tpu.ops.filters import (
    DIV_KERNEL,
    SCHARR_GX,
    SCHARR_GY,
    divergence_filter,
    gaussian_blur_3x3,
    gradient_magnitude,
    scharr_grads,
)
from eincm_tpu.ops.normalize import extract_tiles, normalize_to_unit_range
from eincm_tpu.ops.resize import (
    downscale_theta,
    scale_theta_to_sensor_size,
    upscale_theta,
)
from eincm_tpu.ops.warp import per_pix_warp, warp_events_multi_ref


class TestWarp:
    def test_zero_theta_identity(self, rng):
        xs = jnp.asarray(rng.integers(0, 32, 20).astype(np.float32))
        ys = jnp.asarray(rng.integers(0, 24, 20).astype(np.float32))
        ts = jnp.asarray(rng.uniform(0, 1, 20).astype(np.float32))
        theta = jnp.zeros((24, 32, 2))
        wx, wy = per_pix_warp(theta, xs, ys, ts, 0.0)
        np.testing.assert_allclose(np.asarray(wx), np.asarray(xs))
        np.testing.assert_allclose(np.asarray(wy), np.asarray(ys))

    def test_constant_velocity(self):
        # theta = (2, -1) everywhere: x' = x - 2*(t - t_ref), y' = y + (t - t_ref)
        theta = jnp.tile(jnp.array([2.0, -1.0]), (24, 32, 1))
        xs = jnp.array([10.0, 5.0])
        ys = jnp.array([10.0, 5.0])
        ts = jnp.array([0.5, 1.0])
        wx, wy = per_pix_warp(theta, xs, ys, ts, 0.0)
        np.testing.assert_allclose(np.asarray(wx), [10 - 2 * 0.5, 5 - 2 * 1.0])
        np.testing.assert_allclose(np.asarray(wy), [10 + 0.5, 5 + 1.0])

    def test_coords_rounded_before_gather(self):
        theta = jnp.zeros((8, 8, 2)).at[3, 4, 0].set(7.0)
        # event at (3.6, 2.6) rounds to (4, 3) -> picks up theta[3, 4]
        wx, wy = per_pix_warp(theta, jnp.array([3.6]), jnp.array([2.6]), jnp.array([1.0]), 0.0)
        assert np.isclose(float(wx[0]), 4.0 - 7.0)
        assert np.isclose(float(wy[0]), 3.0)

    def test_multi_ref_matches_single(self, rng):
        theta = jnp.asarray(rng.normal(0, 2, (24, 32, 2)).astype(np.float32))
        xs = jnp.asarray(rng.integers(0, 32, 50).astype(np.float32))
        ys = jnp.asarray(rng.integers(0, 24, 50).astype(np.float32))
        ts = jnp.asarray(rng.uniform(0, 1, 50).astype(np.float32))
        t_refs = jnp.array([0.0, 0.5, 1.0])
        mwx, mwy = warp_events_multi_ref(theta, xs, ys, ts, t_refs)
        for i, tr in enumerate([0.0, 0.5, 1.0]):
            sx, sy = per_pix_warp(theta, xs, ys, ts, tr)
            np.testing.assert_allclose(np.asarray(mwx[i]), np.asarray(sx), rtol=1e-6)
            np.testing.assert_allclose(np.asarray(mwy[i]), np.asarray(sy), rtol=1e-6)


class TestFilters:
    def test_scharr_matches_scipy_convolve(self, rng):
        img = jnp.asarray(rng.normal(0, 1, (17, 23)).astype(np.float32))
        g = scharr_grads(img)
        ref_x = jss.convolve(img, jnp.asarray(SCHARR_GX, img.dtype), mode="same")
        ref_y = jss.convolve(img, jnp.asarray(SCHARR_GY, img.dtype), mode="same")
        np.testing.assert_allclose(np.asarray(g[..., 0]), np.asarray(ref_x), atol=1e-4)
        np.testing.assert_allclose(np.asarray(g[..., 1]), np.asarray(ref_y), atol=1e-4)

    def test_divergence_matches_scipy_convolve(self, rng):
        img = jnp.asarray(rng.normal(0, 1, (12, 15)).astype(np.float32))
        out = divergence_filter(img)
        ref = jss.convolve(img, jnp.asarray(DIV_KERNEL, img.dtype), mode="same")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_blur_preserves_constant(self):
        img = jnp.full((10, 10), 3.0)
        out = gaussian_blur_3x3(img)
        # interior pixels keep the constant (kernel sums to 1)
        np.testing.assert_allclose(np.asarray(out[1:-1, 1:-1]), 3.0, rtol=1e-6)

    def test_gradient_magnitude_range(self, rng):
        img = jnp.asarray(rng.normal(0, 1, (16, 16)).astype(np.float32))
        mag = gradient_magnitude(img)
        assert float(mag.min()) >= 0.0
        assert float(mag.max()) <= 1.0 + 1e-6


class TestNormalize:
    def test_unit_range(self, rng):
        arr = jnp.asarray(rng.normal(5, 3, (8, 9)).astype(np.float32))
        out = normalize_to_unit_range(arr)
        assert np.isclose(float(out.min()), 0.0, atol=1e-6)
        assert np.isclose(float(out.max()), 1.0, atol=1e-5)

    def test_constant_array_no_nan(self):
        out = normalize_to_unit_range(jnp.full((4, 4), 2.0))
        assert np.all(np.isfinite(np.asarray(out)))

    def test_extract_tiles_order(self):
        arr = jnp.arange(24).reshape(4, 6).astype(jnp.float32)
        tiles = extract_tiles(arr, 2, 3)
        assert tiles.shape == (4, 2, 3)
        np.testing.assert_allclose(np.asarray(tiles[0]), np.asarray(arr[:2, :3]))
        np.testing.assert_allclose(np.asarray(tiles[1]), np.asarray(arr[:2, 3:6]))
        np.testing.assert_allclose(np.asarray(tiles[2]), np.asarray(arr[2:, :3]))

    def test_extract_tiles_remainder_dropped(self):
        arr = jnp.arange(35).reshape(5, 7).astype(jnp.float32)
        tiles = extract_tiles(arr, 2, 3)
        assert tiles.shape == (4, 2, 3)


class TestResize:
    def test_repeat_upscale(self):
        theta = jnp.arange(8, dtype=jnp.float32).reshape(2, 2, 2)
        up = upscale_theta(theta, base=2, method="repeat")
        assert up.shape == (4, 4, 2)
        np.testing.assert_allclose(np.asarray(up[0, 0]), np.asarray(theta[0, 0]))
        np.testing.assert_allclose(np.asarray(up[1, 1]), np.asarray(theta[0, 0]))
        np.testing.assert_allclose(np.asarray(up[2, 3]), np.asarray(theta[1, 1]))

    def test_bilinear_constant_preserved(self):
        theta = jnp.full((4, 4, 2), 2.5)
        up = scale_theta_to_sensor_size(theta, (16, 20), "bilinear")
        assert up.shape == (16, 20, 2)
        np.testing.assert_allclose(np.asarray(up), 2.5, rtol=1e-5)

    def test_downscale_then_shape(self):
        theta = jnp.ones((8, 8, 2))
        down = downscale_theta(theta, base=2, method="bilinear")
        assert down.shape == (4, 4, 2)
        np.testing.assert_allclose(np.asarray(down), 1.0, rtol=1e-5)

    def test_scale_is_differentiable(self):
        theta = jnp.ones((2, 2, 2))

        def f(t):
            return scale_theta_to_sensor_size(t, (8, 8), "bilinear").sum()

        g = jax.grad(f)(theta)
        assert g.shape == theta.shape
        assert float(jnp.abs(g).sum()) > 0
