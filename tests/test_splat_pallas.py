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


@pytest.mark.slow
def test_randomized_consistency_sweep():
    """Seeded fuzz: the fused kernel (interpret mode) must match the XLA
    oracle in value AND gradient across random sensor sizes, event counts,
    spreads (in/out-of-sensor), and NaN paddings."""
    root = np.random.default_rng(2024)
    for draw in range(10):
        rng = np.random.default_rng(root.integers(1 << 31))
        h = int(rng.integers(8, 64))
        w = int(rng.integers(8, 96))
        n = int(rng.integers(50, 20_000))
        spread = float(rng.uniform(0, 8))
        nan_frac = float(rng.uniform(0, 0.2))
        sensor = (h, w)

        xs = rng.uniform(-spread, w - 1 + spread, n).astype(np.float32)
        ys = rng.uniform(-spread, h - 1 + spread, n).astype(np.float32)
        bad = rng.uniform(0, 1, n) < nan_frac
        xs[bad] = np.nan
        ys[bad & (rng.uniform(0, 1, n) < 0.5)] = np.nan  # mixed NaN channels
        xs_j, ys_j = jnp.asarray(xs), jnp.asarray(ys)

        a = events_to_pdf_frame_pallas(xs_j, ys_j, sensor, 3, True)
        b = events_to_pdf_frame(xs_j, ys_j, sensor)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=f"draw {draw}: fwd sensor={sensor} n={n} "
                    f"spread={spread:.1f} nan={nan_frac:.2f}",
        )

        cot = jnp.asarray(rng.normal(0, 1, sensor).astype(np.float32))
        # NaN coordinates carry no gradient path (sanitization happens in
        # the loss layer); compare grads on the finite events only
        fin = np.isfinite(xs) & np.isfinite(ys)
        xs_f, ys_f = jnp.asarray(xs[fin]), jnp.asarray(ys[fin])

        def f_pallas(xs, ys):
            return (events_to_pdf_frame_pallas(xs, ys, sensor, 3, True) * cot).sum()

        def f_xla(xs, ys):
            return (events_to_pdf_frame(xs, ys, sensor) * cot).sum()

        gx_p, gy_p = jax.grad(f_pallas, argnums=(0, 1))(xs_f, ys_f)
        gx_x, gy_x = jax.grad(f_xla, argnums=(0, 1))(xs_f, ys_f)
        np.testing.assert_allclose(
            np.asarray(gx_p), np.asarray(gx_x), rtol=1e-3, atol=1e-4,
            err_msg=f"draw {draw}: d/dx sensor={sensor} n={n}",
        )
        np.testing.assert_allclose(
            np.asarray(gy_p), np.asarray(gy_x), rtol=1e-3, atol=1e-4,
            err_msg=f"draw {draw}: d/dy sensor={sensor} n={n}",
        )


# ---------------------------------------------------------------- banded

BSENSOR = (320, 384)  # tall/wide enough that 128-row + 256-col bands engage


def _sorted_events(rng, n, spread=4.0):
    h, w = BSENSOR
    ys = np.sort(rng.uniform(0, h - 1, n)).astype(np.float32)
    xs = rng.uniform(0, w - 1, n).astype(np.float32)
    wy = jnp.asarray(ys + rng.uniform(-spread, spread, n).astype(np.float32))
    wx = jnp.asarray(xs + rng.uniform(-spread, spread, n).astype(np.float32))
    return wx, wy


def test_banded_interpret_forward_and_grad(rng):
    """Row-banded kernel (interpret mode) vs the XLA oracle, incl. VJP."""
    from eincm_tpu.ops.splat_banded import (
        _precompute,
        events_to_pdf_frame_pallas_banded,
    )

    wx, wy = _sorted_events(rng, 40000)
    # the row band must actually validate, else this test exercises nothing
    _, _, ok_rows, *_ = _precompute(wx, wy, BSENSOR, 3, False)
    assert bool(ok_rows[128])

    a = events_to_pdf_frame_pallas_banded(wx, wy, BSENSOR, 3, False, True)
    b = events_to_pdf_frame(wx, wy, BSENSOR)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    cot = jnp.asarray(rng.normal(0, 1, BSENSOR).astype(np.float32))

    def f_banded(wx, wy):
        return (
            events_to_pdf_frame_pallas_banded(wx, wy, BSENSOR, 3, False, True)
            * cot
        ).sum()

    def f_xla(wx, wy):
        return (events_to_pdf_frame(wx, wy, BSENSOR) * cot).sum()

    gx_p, gy_p = jax.grad(f_banded, argnums=(0, 1))(wx, wy)
    gx_x, gy_x = jax.grad(f_xla, argnums=(0, 1))(wx, wy)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy_p), np.asarray(gy_x), rtol=1e-3, atol=1e-5)


def test_banded2d_interpret_tile_sorted(rng):
    """Column-banded configuration (tile-sorted staging) in interpret mode."""
    from eincm_tpu.data.staging import tile_sort_events
    from eincm_tpu.ops.splat_banded import (
        _precompute,
        events_to_pdf_frame_pallas_banded,
    )

    h, w = BSENSOR
    n = 100000
    xs0 = rng.uniform(0, w - 1, n).astype(np.float32)
    ys0 = rng.uniform(0, h - 1, n).astype(np.float32)
    ts0 = rng.uniform(0, 1, n).astype(np.float32)
    xs_t, ys_t, _, _ = tile_sort_events(xs0, ys0, ts0, np.zeros(n, bool), h)
    wy = np.asarray(ys_t) + rng.uniform(-3, 3, len(ys_t)).astype(np.float32)
    wx = np.asarray(xs_t) + rng.uniform(-3, 3, len(xs_t)).astype(np.float32)
    pad = ~np.isfinite(np.asarray(ys_t))
    wy[pad] = np.nan
    wx[pad] = np.nan
    jwx, jwy = jnp.asarray(wx), jnp.asarray(wy)

    _, _, ok_rows, ok_cols, _, ok_u = _precompute(jwx, jwy, BSENSOR, 3, True)
    assert bool(ok_rows[128]) and bool(np.asarray(ok_cols).any())

    a = events_to_pdf_frame_pallas_banded(jwx, jwy, BSENSOR, 3, True, True)
    b = events_to_pdf_frame(jwx, jwy, BSENSOR)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_stacked_multiref_matches_per_ref_loop(rng):
    """The single-grid stacked multi-ref splat must match per-ref kernel
    calls (and the XLA oracle) in value and gradient, including boundary
    spill near row 0 / row H-1 and out-of-sensor drops (interpret mode)."""
    from eincm_tpu.ops.splat import _splat_multi_ref_stacked, events_to_pdf_frame

    h, w = BSENSOR
    n = 30000
    wxs, wys = [], []
    for r in range(2):
        wx, wy = _sorted_events(rng, n, spread=6.0)
        # force boundary traffic: pull some events just outside the sensor
        wy = jnp.where(jnp.arange(n) % 97 == 0, wy - float(h // 2), wy)
        wy = jnp.where(jnp.arange(n) % 89 == 1, wy + float(h // 2), wy)
        # quantize to 1/64 so the stacked path's frame-offset addition is
        # EXACT in f32: generic coords within one ULP of a .5 boundary
        # legitimately flip their rounding after the offset (documented
        # sub-ULP deviation, ops/splat.py) and would fail a paired compare
        wy = jnp.round(wy * 64.0) / 64.0
        wx = jnp.round(wx * 64.0) / 64.0
        wxs.append(wx)
        wys.append(wy)
    wxs = jnp.stack(wxs)
    wys = jnp.stack(wys)

    stacked = _splat_multi_ref_stacked(
        wxs, wys, BSENSOR, 3, try_col_band=False, interpret=True
    )
    oracle = jax.vmap(
        lambda a, b: events_to_pdf_frame(a, b, BSENSOR)
    )(wxs, wys)
    # rtol is looser than the per-ref kernel tests': concatenating refs
    # shifts ref>0's 256-event chunk groupings, so f32 partial sums
    # REASSOCIATE vs the per-ref call (measured max abs delta ~8e-4 on
    # busy pixels — far below the smallest representable splat fragment
    # exp(-2)/sqrt(2pi) ~ 0.054, i.e. pure accumulation-order noise, not a
    # dropped/misplaced contribution)
    np.testing.assert_allclose(
        np.asarray(stacked), np.asarray(oracle), rtol=2e-3, atol=5e-4
    )

    cot = jnp.asarray(rng.normal(0, 1, (2, h, w)).astype(np.float32))

    def f_stacked(a, b):
        return (
            _splat_multi_ref_stacked(a, b, BSENSOR, 3, False, True) * cot
        ).sum()

    def f_oracle(a, b):
        return (
            jax.vmap(lambda u, v: events_to_pdf_frame(u, v, BSENSOR))(a, b)
            * cot
        ).sum()

    gx_s, gy_s = jax.grad(f_stacked, argnums=(0, 1))(wxs, wys)
    gx_o, gy_o = jax.grad(f_oracle, argnums=(0, 1))(wxs, wys)
    # atol covers near-zero gradient components whose reassociation noise
    # (measured <= 2.2e-5 abs on grads of typical magnitude ~0.2) trips a
    # pure rtol bound
    np.testing.assert_allclose(
        np.asarray(gx_s), np.asarray(gx_o), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gy_s), np.asarray(gy_o), rtol=1e-3, atol=1e-4
    )


def test_stacked_multiref_col_banded_tile_sorted(rng):
    """Stacked multi-ref with try_col_band=True over tile-sorted events
    (the DSEC production staging) — value AND gradient vs the per-ref XLA
    oracle (interpret mode)."""
    from eincm_tpu.data.staging import tile_sort_events
    from eincm_tpu.ops.splat import _splat_multi_ref_stacked, events_to_pdf_frame

    h, w = BSENSOR
    n = 60000
    wxs, wys = [], []
    for r in range(2):
        xs0 = rng.uniform(0, w - 1, n).astype(np.float32)
        ys0 = rng.uniform(0, h - 1, n).astype(np.float32)
        ts0 = rng.uniform(0, 1, n).astype(np.float32)
        xs_t, ys_t, _, _ = tile_sort_events(
            xs0, ys0, ts0, np.zeros(n, bool), h
        )
        ep = len(xs_t)
        wx = np.asarray(xs_t) + rng.uniform(-4, 4, ep).astype(np.float32)
        wy = np.asarray(ys_t) + rng.uniform(-4, 4, ep).astype(np.float32)
        # 1/64 quantization: keep the frame-offset addition exact (see the
        # sub-ULP note in ops/splat._splat_multi_ref_stacked)
        wx = np.round(wx * 64.0) / 64.0
        wy = np.round(wy * 64.0) / 64.0
        pad = ~np.isfinite(np.asarray(ys_t))
        wx[pad] = np.nan
        wy[pad] = np.nan
        wxs.append(wx)
        wys.append(wy)
    wxs = jnp.asarray(np.stack(wxs).astype(np.float32))
    wys = jnp.asarray(np.stack(wys).astype(np.float32))

    stacked = _splat_multi_ref_stacked(
        wxs, wys, BSENSOR, 3, try_col_band=True, interpret=True
    )
    oracle = jax.vmap(
        lambda a, b: events_to_pdf_frame(a, b, BSENSOR)
    )(wxs, wys)
    np.testing.assert_allclose(
        np.asarray(stacked), np.asarray(oracle), rtol=2e-3, atol=5e-4
    )

    cot = jnp.asarray(rng.normal(0, 1, (2, h, w)).astype(np.float32))

    def f_stacked(a, b):
        return (
            _splat_multi_ref_stacked(a, b, BSENSOR, 3, True, True) * cot
        ).sum()

    def f_oracle(a, b):
        return (
            jax.vmap(lambda u, v: events_to_pdf_frame(u, v, BSENSOR))(a, b)
            * cot
        ).sum()

    gx_s, gy_s = jax.grad(f_stacked, argnums=(0, 1))(wxs, wys)
    gx_o, gy_o = jax.grad(f_oracle, argnums=(0, 1))(wxs, wys)
    for gs, go in ((gx_s, gx_o), (gy_s, gy_o)):
        gs, go = np.asarray(gs), np.asarray(go)
        fin = np.isfinite(go)
        np.testing.assert_allclose(gs[fin], go[fin], rtol=1e-3, atol=1e-4)


def test_stacked_multiref_nan_padding(rng):
    """NaN-padded (deficient-window) events contribute nothing and produce
    finite zero gradients through the stacked path."""
    from eincm_tpu.ops.splat import _splat_multi_ref_stacked, events_to_pdf_frame

    wx, wy = _sorted_events(rng, 8000)
    pad = jnp.full((1024,), jnp.nan, jnp.float32)
    wxs = jnp.stack([jnp.concatenate([wx, pad])] * 2)
    wys = jnp.stack([jnp.concatenate([wy, pad])] * 2)

    def f(a, b):
        return _splat_multi_ref_stacked(a, b, BSENSOR, 3, False, True).sum()

    val = f(wxs, wys)
    ref = 2 * events_to_pdf_frame(wx, wy, BSENSOR).sum()
    np.testing.assert_allclose(float(val), float(ref), rtol=1e-4)
    gx, gy = jax.grad(f, argnums=(0, 1))(wxs, wys)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(np.asarray(gy)).all()


def test_banded_band_start_regression(rng):
    """Non-monotone band starts stay banded: a later chunk whose warped rows
    regress below the previous chunk's band (but not below the sliding
    window's floor) must validate — the start is lifted to the window floor
    — and still match the oracle. A cummax-based start sequence would have
    rejected this layout (rows 150-160 < cummax'd start 184)."""
    from eincm_tpu.ops.splat_banded import (
        _CHUNK,
        _precompute,
        events_to_pdf_frame_pallas_banded,
    )

    h, w = BSENSOR
    rows = ([245.0] * _CHUNK) + ([305.0] * _CHUNK) + ([155.0] * _CHUNK)
    n = len(rows)
    wy = jnp.asarray(
        np.array(rows, np.float32) + rng.uniform(-4, 4, n).astype(np.float32)
    )
    wx = jnp.asarray(rng.uniform(1, w - 2, n).astype(np.float32))

    _, _, ok_rows, *_ = _precompute(wx, wy, BSENSOR, 3, False)
    assert bool(ok_rows[128])

    a = events_to_pdf_frame_pallas_banded(wx, wy, BSENSOR, 3, False, True)
    b = events_to_pdf_frame(wx, wy, BSENSOR)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_banded_unaligned_column_band(rng):
    """The unaligned 128-wide column band (shift-matrix epilogue) must
    engage for tile-sorted narrow-spread events — including chunks that
    straddle a 128-column alignment boundary, which invalidate every
    ALIGNED narrow candidate — and match the oracle in value and grad."""
    from eincm_tpu.data.staging import tile_sort_events
    from eincm_tpu.ops.splat_banded import (
        _precompute,
        events_to_pdf_frame_pallas_banded,
    )

    h, w = BSENSOR
    n = 100000
    xs0 = rng.uniform(0, w - 1, n).astype(np.float32)
    ys0 = rng.uniform(0, h - 1, n).astype(np.float32)
    ts0 = rng.uniform(0, 1, n).astype(np.float32)
    xs_t, ys_t, _, _ = tile_sort_events(xs0, ys0, ts0, np.zeros(n, bool), h)
    wy = np.asarray(ys_t) + rng.uniform(-3, 3, len(ys_t)).astype(np.float32)
    wx = np.asarray(xs_t) + rng.uniform(-3, 3, len(xs_t)).astype(np.float32)
    pad = ~np.isfinite(np.asarray(ys_t))
    wy[pad] = np.nan
    wx[pad] = np.nan
    jwx, jwy = jnp.asarray(wx), jnp.asarray(wy)

    _, _, ok_rows, _, _, ok_u = _precompute(jwx, jwy, BSENSOR, 3, True)
    assert bool(ok_rows[128]) and bool(ok_u)

    a = events_to_pdf_frame_pallas_banded(jwx, jwy, BSENSOR, 3, True, True)
    b = events_to_pdf_frame(jwx, jwy, BSENSOR)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    cot = jnp.asarray(rng.normal(0, 1, BSENSOR).astype(np.float32))

    def f_banded(wx_):
        return (
            events_to_pdf_frame_pallas_banded(wx_, jwy, BSENSOR, 3, True, True)
            * cot
        ).sum()

    def f_xla(wx_):
        return (events_to_pdf_frame(wx_, jwy, BSENSOR) * cot).sum()

    g1 = jax.grad(f_banded)(jwx)
    g2 = jax.grad(f_xla)(jwx)
    m = np.isfinite(wx)
    np.testing.assert_allclose(
        np.asarray(g1)[m], np.asarray(g2)[m], rtol=1e-3, atol=1e-5
    )


def test_fully_fused_band_bound_includes_rounded_row(rng):
    """Regression (round-3 review): the fused prototype's per-chunk band
    bound must include the in-kernel round() — a displacement that lands
    events at cy = *.6 splats into row round(cy)+hw, which the unrounded
    bound truncated away while still reporting ok=True (silently dropped
    boundary-row mass)."""
    from eincm_tpu.experimental.splat_fused import fully_fused_warp_splat_frame

    H, W = BSENSOR
    n = 512
    xs = jnp.round(jnp.asarray(rng.uniform(5, W - 6, n).astype(np.float32)))
    ys = jnp.full((n,), 267.0, jnp.float32)  # pre-rounded, like the bench
    ts = jnp.ones((n,), jnp.float32)
    # constant +4.4 px/s vertical flow: cy = 267 - 4.4 = 262.6 for every
    # event, so the splat window is rows 262..264 around round(cy) = 263
    theta = jnp.zeros((16, 16, 2), jnp.float32).at[..., 1].set(4.4)
    frame, ok = fully_fused_warp_splat_frame(
        xs, ys, ts, theta, 0.0, BSENSOR, interpret=True
    )
    assert bool(ok)
    oracle = events_to_pdf_frame(
        xs, jnp.full((n,), 262.6, jnp.float32), BSENSOR
    )
    assert float(oracle[264].sum()) > 1.0  # the boundary row carries mass
    np.testing.assert_allclose(
        np.asarray(frame), np.asarray(oracle), rtol=1e-4, atol=1e-4
    )
