"""Real-TPU kernel parity tests — skipped on the CPU test mesh.

The CI suite forces JAX_PLATFORMS=cpu (conftest.py); these tests only run
when executed on a machine where the default backend is a TPU, e.g.:

    JAX_PLATFORMS='' python -m pytest tests/test_tpu_kernels.py --no-header -q

They close the loop on the Pallas kernels whose CPU coverage is interpret-
mode only (tests/test_splat_pallas.py): numerics of the fused full-height
kernel and the row-banded kernel against the scatter oracle on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

on_tpu = jax.default_backend() == "tpu"
pytestmark = pytest.mark.skipif(not on_tpu, reason="needs a real TPU backend")


@pytest.fixture(scope="module")
def events():
    H, W, E = 480, 640, 200_000
    r = np.random.default_rng(3)
    ys = np.sort(r.uniform(0, H - 1, E)).astype(np.float32)
    xs = r.uniform(0, W - 1, E).astype(np.float32)
    wy = jnp.asarray(np.round(ys) - r.uniform(-20, 20, E).astype(np.float32))
    wx = jnp.asarray(np.round(xs) - r.uniform(-30, 30, E).astype(np.float32))
    return (H, W), wx, wy


def test_full_kernel_vs_oracle(events):
    from eincm_tpu.ops.splat import events_to_pdf_frame_scatter
    from eincm_tpu.ops.splat_pallas import events_to_pdf_frame_pallas

    sensor, wx, wy = events
    a = np.asarray(events_to_pdf_frame_pallas(wx, wy, sensor))
    b = np.asarray(events_to_pdf_frame_scatter(wx, wy, sensor))
    assert np.abs(a - b).max() / np.abs(b).max() < 5e-3  # single-pass bf16 MXU


def test_banded_kernel_vs_oracle_and_grads(events):
    from eincm_tpu.ops.splat import events_to_pdf_frame_scatter
    from eincm_tpu.ops.splat_banded import events_to_pdf_frame_pallas_banded
    from eincm_tpu.ops.splat_pallas import events_to_pdf_frame_pallas

    sensor, wx, wy = events
    a = np.asarray(events_to_pdf_frame_pallas_banded(wx, wy, sensor))
    b = np.asarray(events_to_pdf_frame_scatter(wx, wy, sensor))
    assert np.abs(a - b).max() / np.abs(b).max() < 5e-3

    g1 = jax.grad(
        lambda w: jnp.sum(jnp.sin(events_to_pdf_frame_pallas_banded(w, wy, sensor)))
    )(wx)
    g2 = jax.grad(
        lambda w: jnp.sum(jnp.sin(events_to_pdf_frame_pallas(w, wy, sensor)))
    )(wx)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("vmax", [8.0, 80.0, 300.0])
def test_banded2d_adaptive_column_band(vmax):
    """Tile-sorted events engage the narrowest valid column band (128, then
    256), degrading to row band / full height as the flow magnitude grows;
    every path must match the scatter oracle in value and gradient."""
    from eincm_tpu.data.staging import tile_sort_events
    from eincm_tpu.ops.splat import events_to_pdf_frame_scatter
    from eincm_tpu.ops.splat_banded import events_to_pdf_frame_pallas_banded

    H, W, E = 480, 640, 120_000
    r = np.random.default_rng(7)
    xs0 = r.uniform(0, W - 1, E).astype(np.float32)
    ys0 = r.uniform(0, H - 1, E).astype(np.float32)
    ts0 = r.uniform(0, 1, E).astype(np.float32)
    xs_t, ys_t, _, _ = tile_sort_events(xs0, ys0, ts0, np.zeros(E, bool), H)
    wy = np.round(ys_t) - r.uniform(-vmax, vmax, len(ys_t)).astype(np.float32)
    wx = np.round(xs_t) - r.uniform(-vmax, vmax, len(xs_t)).astype(np.float32)
    pad = ~np.isfinite(ys_t)
    wy[pad] = np.nan
    wx[pad] = np.nan
    jwx, jwy = jnp.asarray(wx), jnp.asarray(wy)

    a = np.asarray(
        events_to_pdf_frame_pallas_banded(jwx, jwy, (H, W), 3, True)
    )
    b = np.asarray(events_to_pdf_frame_scatter(jwx, jwy, (H, W)))
    assert np.abs(a - b).max() / np.abs(b).max() < 5e-3

    g1 = jax.grad(
        lambda w: jnp.sum(
            jnp.sin(events_to_pdf_frame_pallas_banded(w, jwy, (H, W), 3, True))
        )
    )(jwx)
    g2 = jax.grad(
        lambda w: jnp.sum(jnp.sin(events_to_pdf_frame_scatter(w, jwy, (H, W))))
    )(jwx)
    # padded (NaN-coordinate) events: the oracle's grad is NaN through the
    # where() (standard where-grad artifact), ours is sanitized to 0 —
    # compare only real events
    m = np.isfinite(wx)
    assert np.abs(np.asarray(g1)[m] - np.asarray(g2)[m]).max() < 2e-2


def test_interp_pallas_vs_xla(events):
    """Coarse-theta interp kernel on hardware: the routed Pallas path must
    match the XLA one-hot matmul path in value and theta-gradient (CPU
    coverage is interpret-mode only, tests/test_interp_pallas.py)."""
    from eincm_tpu.ops import warp

    sensor, wx, wy = events
    r = np.random.default_rng(11)
    theta = jnp.asarray(r.normal(0, 3, (16, 16, 2)).astype(np.float32))
    xs = wx[:150_000]
    ys = wy[:150_000]
    cot = jnp.asarray(r.normal(0, 1, (150_000, 2)).astype(np.float32))

    assert warp.get_interp_impl() == "pallas"
    a = warp.interp_theta_at_events(theta, xs, ys, sensor)
    ga = jax.grad(
        lambda t: jnp.vdot(warp.interp_theta_at_events(t, xs, ys, sensor), cot)
    )(theta)
    warp.set_interp_impl("xla")
    try:
        b = warp.interp_theta_at_events(theta, xs, ys, sensor)
        gb = jax.grad(
            lambda t: jnp.vdot(
                warp.interp_theta_at_events(t, xs, ys, sensor), cot
            )
        )(theta)
    finally:
        warp.set_interp_impl("pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=3e-5, atol=1e-2)


def test_stacked_multiref_vs_per_ref_loop(events):
    """Single-grid stacked multi-ref splat vs per-ref kernel calls on
    hardware. Coordinates quantize to 1/64 so the frame-offset addition is
    exact (the generic-f32 sub-ULP .5-boundary snap is documented in
    ops/splat.py and excluded here by construction)."""
    from eincm_tpu.ops.splat import _splat_multi_ref_stacked
    from eincm_tpu.ops.splat_banded import events_to_pdf_frame_pallas_banded

    sensor, wx, wy = events
    q = lambda a: jnp.round(a * 64.0) / 64.0
    r = np.random.default_rng(11)
    jit2 = jnp.asarray(r.uniform(-3, 3, wx.shape[0]).astype(np.float32))
    wxs = jnp.stack([q(wx), q(wx + jit2)])
    wys = jnp.stack([q(wy), q(wy - jit2)])

    stacked = np.asarray(
        jax.jit(
            lambda a, b: _splat_multi_ref_stacked(a, b, sensor, 3, False)
        )(wxs, wys)
    )
    loop = np.stack(
        [
            np.asarray(
                events_to_pdf_frame_pallas_banded(wxs[i], wys[i], sensor, 3)
            )
            for i in range(2)
        ]
    )
    # bf16 MXU contractions + re-chunked accumulation order
    assert np.abs(stacked - loop).max() / np.abs(loop).max() < 5e-3


def test_banded_fallback_unsorted(events):
    from eincm_tpu.ops.splat import events_to_pdf_frame_scatter
    from eincm_tpu.ops.splat_banded import events_to_pdf_frame_pallas_banded

    sensor, wx, wy = events
    perm = np.random.default_rng(0).permutation(wx.shape[0])
    a = np.asarray(events_to_pdf_frame_pallas_banded(wx[perm], wy[perm], sensor))
    b = np.asarray(events_to_pdf_frame_scatter(wx, wy, sensor))
    assert np.abs(a - b).max() / np.abs(b).max() < 5e-3


def test_scan_solver_equivalence_on_tpu():
    """Scan-over-levels vs per-level build on the REAL TPU: bit-exact.

    TPU vector lanes pad every reduction to the same tree shape, so the
    padded-BFGS arithmetic matches the per-level build exactly (measured
    zero delta across 9 chained windows x 3 configs in round 5); on CPU the
    same comparison drifts at ULP level (see tests/test_pyramid_scan.py).
    A small tolerance guards against future lane-layout changes.
    """
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_pyramid_scan import _cfg, _window

    from eincm_tpu.models.pyramid import HandoverSettings, solve_window
    from eincm_tpu.models.pyramid_scan import solve_window_scan

    cfg = _cfg(
        handover=HandoverSettings(
            solve_handover_for_levels=(0, 1), handover_grid_probes=5
        ),
        compute_prior_loss=True,
    )
    prior_a = prior_b = cfg.zero_pyramid()
    for i in range(3):
        w = _window(seed=i, velocity=(2.0 + 0.3 * i, -1.0))
        a = solve_window(cfg, w, prior_a, is_first_sample=(i == 0))
        b = solve_window_scan(cfg, w, prior_b, is_first_sample=(i == 0))
        for lvl in range(cfg.n_pyr_lvls):
            d = float(
                np.max(
                    np.abs(
                        np.asarray(a.final_theta_pyr[lvl])
                        - np.asarray(b.final_theta_pyr[lvl])
                    )
                )
            )
            assert d <= 1e-6, (i, lvl, d)
            sa, sb = a.theta_opt_states[lvl], b.theta_opt_states[lvl]
            assert int(sa.total_iters) == int(sb.total_iters), (i, lvl)
            assert int(sa.status) == int(sb.status), (i, lvl)
        for wa, wb in zip(a.final_handover_weights, b.final_handover_weights):
            assert abs(float(wa) - float(wb)) <= 1e-6
        prior_a, prior_b = a.final_theta_pyr, b.final_theta_pyr
