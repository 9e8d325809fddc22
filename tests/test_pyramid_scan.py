"""Scan-over-levels solver equivalence vs the per-level build.

The scan variant (models/pyramid_scan.py) must reproduce the per-level
solver's trajectories: same math per level, one traced level body. These
tests drive both on identical synthetic windows (first + chained) and
assert the full SolveResult matches.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from eincm_tpu.models.loss import LossParams
from eincm_tpu.models.pyramid import (
    HandoverSettings,
    SolverConfig,
    WindowSample,
    solve_window,
)
from eincm_tpu.models.pyramid_scan import solve_window_scan
from eincm_tpu.ops.filters import gaussian_blur_3x3
from eincm_tpu.ops.normalize import normalize_to_unit_range
from eincm_tpu.ops.splat import events_to_pdf_frame


def _cfg(**kw):
    base = dict(
        n_pyr_lvls=3,
        sensor_size=(32, 32),
        params=LossParams(alpha=60.0, beta=0.0),
        theta_opt_maxiters=(8, 6, 4),
        handover_opt_maxiters=(5, 5, 5),
        n_extra_attempts={0: 1},
        max_ls_evals=6,
    )
    base.update(kw)
    return SolverConfig(**base)


def _window(seed=0, velocity=(2.0, -1.0), sensor=(32, 32), n_events=1024):
    """Moving-dots window (same scheme as tests/test_pyramid.py)."""
    rng = np.random.default_rng(seed)
    h, w = sensor
    feat = rng.uniform(4, min(h, w) - 8, size=(24, 2))
    ts = rng.uniform(0, 1, n_events).astype(np.float32)
    which = rng.integers(0, len(feat), n_events)
    xs = np.round(feat[which, 0] + velocity[0] * ts).astype(np.float32)
    ys = np.round(feat[which, 1] + velocity[1] * ts).astype(np.float32)

    def edge_map(t):
        ex = jnp.asarray(feat[:, 0] + velocity[0] * t)
        ey = jnp.asarray(feat[:, 1] + velocity[1] * t)
        m = events_to_pdf_frame(ex, ey, sensor)
        return normalize_to_unit_range(gaussian_blur_3x3(m))

    return WindowSample(
        xs=jnp.asarray(xs),
        ys=jnp.asarray(ys),
        ts=jnp.asarray(ts),
        edges=jnp.stack([edge_map(0.0), edge_map(1.0)]),
        edge_ts=jnp.array([0.0, 1.0], jnp.float32),
    )


def _assert_results_match(a, b, rtol=1e-5, atol=1e-6):
    for name in (
        "prior_theta_pyr",
        "pre_opt_theta_pyr",
        "pre_handover_theta_pyr",
        "final_theta_pyr",
    ):
        for lvl, (ta, tb) in enumerate(zip(getattr(a, name), getattr(b, name))):
            assert ta.shape == tb.shape, (name, lvl)
            np.testing.assert_allclose(
                np.asarray(ta), np.asarray(tb), rtol=rtol, atol=atol,
                err_msg=f"{name} lvl {lvl}",
            )
    for lvl, (sa, sb) in enumerate(
        zip(a.theta_opt_states, b.theta_opt_states)
    ):
        assert int(sa.status) == int(sb.status), lvl
        assert int(sa.total_iters) == int(sb.total_iters), lvl
        assert int(sa.n_attempts) == int(sb.n_attempts), lvl
        np.testing.assert_allclose(
            float(sa.fun_val), float(sb.fun_val), rtol=1e-5, atol=1e-7,
            err_msg=f"fun_val lvl {lvl}",
        )
    for lvl, (wa, wb) in enumerate(
        zip(a.final_handover_weights, b.final_handover_weights)
    ):
        np.testing.assert_allclose(
            float(wa), float(wb), rtol=1e-5, atol=1e-6,
            err_msg=f"handover w lvl {lvl}",
        )


class TestScanEquivalence:
    def test_first_window(self):
        cfg = _cfg()
        w = _window()
        zero = cfg.zero_pyramid()
        a = solve_window(cfg, w, zero, is_first_sample=True)
        b = solve_window_scan(cfg, w, zero, is_first_sample=True)
        _assert_results_match(a, b)

    def test_chained_windows_with_handover_solve(self):
        cfg = _cfg(
            handover=HandoverSettings(
                solve_handover_for_levels=(0, 1),
                handover_grid_probes=5,
            ),
            compute_prior_loss=True,
        )
        prior_a = prior_b = cfg.zero_pyramid()
        for i in range(3):
            w = _window(seed=i, velocity=(2.0 + 0.3 * i, -1.0))
            a = solve_window(cfg, w, prior_a, is_first_sample=(i == 0))
            b = solve_window_scan(cfg, w, prior_b, is_first_sample=(i == 0))
            _assert_results_match(a, b)
            if i > 0:
                np.testing.assert_allclose(
                    float(a.prior_loss_lvl0),
                    float(b.prior_loss_lvl0),
                    rtol=1e-5,
                )
            prior_a = a.final_theta_pyr
            prior_b = b.final_theta_pyr

    def test_tv_term_gamma_and_ftol(self):
        # gamma engages the TV switch branches + the dynamic level gate;
        # ftol exercises the noise-floor termination under traced maxiters
        cfg = _cfg(
            params=LossParams(alpha=20.0, beta=35.0, gamma=0.0025),
            theta_ftol=1e-5,
        )
        w = _window(velocity=(1.5, 2.0))
        zero = cfg.zero_pyramid()
        a = solve_window(cfg, w, zero, is_first_sample=True)
        b = solve_window_scan(cfg, w, zero, is_first_sample=True)
        _assert_results_match(a, b)

    def test_wolfe_line_search(self):
        cfg = _cfg(line_search="wolfe", max_ls_evals=10)
        w = _window()
        zero = cfg.zero_pyramid()
        a = solve_window(cfg, w, zero, is_first_sample=True)
        b = solve_window_scan(cfg, w, zero, is_first_sample=True)
        _assert_results_match(a, b)

    def test_collect_intermediate_rejected(self):
        cfg = _cfg(collect_intermediate=True)
        w = _window()
        with pytest.raises(ValueError, match="collect_intermediate"):
            solve_window_scan(cfg, w, cfg.zero_pyramid(), True)
