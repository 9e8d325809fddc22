"""On-device BFGS vs scipy on standard problems."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize as sopt

from eincm_tpu.models.bfgs import minimize_bfgs, minimize_bounded_scalar


def _fg(f):
    vg = jax.value_and_grad(f)
    return lambda x: vg(x)


def test_quadratic_exact():
    A = jnp.array([[3.0, 1.0], [1.0, 2.0]])
    b = jnp.array([1.0, -2.0])

    def f(x):
        return 0.5 * x @ A @ x - b @ x

    res = minimize_bfgs(_fg(f), jnp.array([5.0, 5.0]), maxiter=50, gtol=1e-4)
    x_expected = np.linalg.solve(np.asarray(A), np.asarray(b))
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.x), x_expected, atol=1e-4)


def test_rosenbrock_matches_scipy():
    def f(x):
        return (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    x0 = jnp.array([-1.2, 1.0])
    res = minimize_bfgs(_fg(f), x0, maxiter=200, gtol=1e-5)
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-3)

    sres = sopt.minimize(
        lambda x: float(f(jnp.asarray(x))), np.array([-1.2, 1.0]), method="BFGS"
    )
    assert float(res.fun_val) <= sres.fun + 1e-6


class TestFtolStop:
    """Opt-in noise-floor termination (status 4): stop after consecutive
    below-floor relative improvements, never retried."""

    @staticmethod
    def _slow(x):
        # Rosenbrock converges through long stretches of tiny relative
        # improvement — ideal for tripping a coarse ftol early
        return (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    def test_stops_early_with_status_4(self):
        x0 = jnp.array([-1.2, 1.0])
        base = minimize_bfgs(
            _fg(self._slow), x0, maxiter=200, gtol=1e-12, fun=self._slow
        )
        res = minimize_bfgs(
            _fg(self._slow), x0, maxiter=200, gtol=1e-12,
            ftol=1e-3, ftol_patience=2, fun=self._slow,
        )
        assert int(res.status) == 4
        assert int(res.total_iters) < int(base.total_iters)
        # the stop fires near the optimum, not mid-descent
        assert float(res.fun_val) < 1e-2

    def test_status4_is_terminal_no_retry(self):
        x0 = jnp.array([-1.2, 1.0])
        res = minimize_bfgs(
            _fg(self._slow), x0, maxiter=200, gtol=1e-12,
            ftol=1e-3, ftol_patience=2, n_extra_attempts=3, fun=self._slow,
        )
        assert int(res.status) == 4
        assert int(res.n_attempts) == 1  # a deliberate stop never retries

    def test_none_preserves_reference_semantics(self):
        # identical trajectories with ftol=None vs the pre-ftol behavior:
        # gtol convergence on the quadratic, same iterate
        def f(x):
            return jnp.sum((x - 1.0) ** 2)

        x0 = jnp.zeros(4)
        a = minimize_bfgs(_fg(f), x0, maxiter=50, gtol=1e-6)
        b = minimize_bfgs(_fg(f), x0, maxiter=50, gtol=1e-6, ftol=None)
        np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
        assert int(a.status) == int(b.status) == 0

    def test_noise_floor_stops_without_retry(self):
        # honest model of the f32 noise floor: the VALUE quantizes to a
        # coarse grid while the GRADIENT stays the analytic one (so gtol
        # never fires). Descent makes real progress until all probe values
        # land in one bucket; then the line search exhausts finding no
        # improving step. Without ftol: status 2 + the extra-attempt retry
        # re-runs the level. With ftol: the floor is declared (status 4)
        # and the retry is skipped.
        q = 0.25

        def f(x):
            return jnp.round(jnp.sum((x - 1.0) ** 2) / q) * q

        def fg(x):
            return f(x), 2.0 * (x - 1.0)

        x0 = jnp.array([5.0, -4.0])
        base = minimize_bfgs(
            fg, x0, maxiter=40, gtol=1e-10, line_search="armijo", fun=f,
            max_ls_evals=6, n_extra_attempts=2,
        )
        res = minimize_bfgs(
            fg, x0, maxiter=40, gtol=1e-10, line_search="armijo", fun=f,
            max_ls_evals=6, n_extra_attempts=2, ftol=1e-9, ftol_patience=2,
        )
        assert int(base.status) == 2 and int(base.n_attempts) == 3
        assert int(res.status) == 4
        assert int(res.n_attempts) <= 2  # at most one retry before the stop
        assert int(res.n_fun_evals) < int(base.n_fun_evals)
        # same quality: both end at the same quantized floor value
        assert float(res.fun_val) == float(base.fun_val)

    def test_patience_1_clamped_to_2(self):
        # advisor r4: at patience 1 an ISOLATED line-search exhaustion
        # (n_small == 0) would immediately declare status 4 and skip the
        # Hessian-reset retry the docstring guarantees. The clamp makes
        # patience=1 behave exactly like patience=2.
        q = 0.25

        def f(x):
            return jnp.round(jnp.sum((x - 1.0) ** 2) / q) * q

        def fg(x):
            return f(x), 2.0 * (x - 1.0)

        x0 = jnp.array([5.0, -4.0])
        kw = dict(
            maxiter=40, gtol=1e-10, line_search="armijo", fun=f,
            max_ls_evals=6, n_extra_attempts=2, ftol=1e-9,
        )
        p1 = minimize_bfgs(fg, x0, ftol_patience=1, **kw)
        p2 = minimize_bfgs(fg, x0, ftol_patience=2, **kw)
        assert int(p1.status) == int(p2.status) == 4
        assert int(p1.n_attempts) == int(p2.n_attempts)
        assert int(p1.n_fun_evals) == int(p2.n_fun_evals)
        np.testing.assert_array_equal(np.asarray(p1.x), np.asarray(p2.x))


def test_high_dim_quadratic():
    rng = np.random.default_rng(0)
    d = 64
    m = rng.normal(size=(d, d))
    A = jnp.asarray(m @ m.T + d * np.eye(d), jnp.float32)
    b = jnp.asarray(rng.normal(size=d), jnp.float32)

    def f(x):
        return 0.5 * x @ A @ x - b @ x

    # gtol is bounded below by f32 resolution of f (~ |f| * eps / step);
    # the solution itself converges to ~1e-5.
    res = minimize_bfgs(_fg(f), jnp.zeros(d), maxiter=300, gtol=5e-3)
    x_expected = np.linalg.solve(np.asarray(A), np.asarray(b))
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.x), x_expected, atol=1e-3)


def test_maxiter_respected():
    def f(x):
        return (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    res = minimize_bfgs(_fg(f), jnp.array([-1.2, 1.0]), maxiter=3, gtol=1e-12)
    assert int(res.iter_num) <= 3
    assert not bool(res.success)
    assert int(res.status) == 1


def test_already_converged():
    def f(x):
        return (x**2).sum()

    res = minimize_bfgs(_fg(f), jnp.zeros(3), maxiter=10, gtol=1e-5)
    assert bool(res.success)
    assert int(res.iter_num) == 0


def test_jittable_and_gradable_through():
    def f(x):
        return ((x - 2.0) ** 2).sum()

    run = jax.jit(lambda x0: minimize_bfgs(_fg(f), x0, maxiter=20).x)
    out = run(jnp.zeros(4))
    np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-4)


def test_warm_start_h0_exact_hessian_one_step():
    """With H0 = A^-1 (the exact inverse Hessian) and a unit first trial
    step a quadratic solves in one iteration; identity needs several."""
    rng = np.random.default_rng(3)
    d = 16
    m = rng.normal(size=(d, d))
    A = jnp.asarray(m @ m.T + d * np.eye(d), jnp.float32)
    b = jnp.asarray(rng.normal(size=d), jnp.float32)

    def f(x):
        return 0.5 * x @ A @ x - b @ x

    x0 = jnp.zeros(d)
    res_i = minimize_bfgs(_fg(f), x0, maxiter=100, gtol=1e-3)
    res_w, h_fin = minimize_bfgs(
        _fg(f), x0, maxiter=100, gtol=1e-3,
        h0=jnp.linalg.inv(A), return_h_inv=True, unit_initial_step=True,
    )
    assert bool(res_w.success)
    assert int(res_w.total_iters) <= 2 < int(res_i.total_iters)
    x_expected = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res_w.x), x_expected, atol=1e-3)
    assert h_fin.shape == (d, d)


def test_warm_start_h0_nonfinite_falls_back():
    """A poisoned warm start (NaN entries) must behave like identity."""
    def f(x):
        return ((x - 2.0) ** 2).sum()

    bad = jnp.full((3, 3), jnp.nan)
    res = minimize_bfgs(_fg(f), jnp.zeros(3), maxiter=50, h0=bad)
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.x), 2.0, atol=1e-4)


def test_warm_start_return_combinations():
    """return_h_inv composes with record_history (result, hist, h_inv)."""
    def f(x):
        return ((x - 1.0) ** 2).sum()

    res, hist, h = minimize_bfgs(
        _fg(f), jnp.zeros(2), maxiter=10, record_history=True,
        return_h_inv=True,
    )
    assert hist.xs.shape[0] == 10 and h.shape == (2, 2)
    assert bool(res.success)


def test_nonconvex_decreases():
    def f(x):
        return jnp.sin(3 * x[0]) * jnp.cos(2 * x[1]) + 0.1 * (x**2).sum()

    x0 = jnp.array([0.5, 0.5])
    res = minimize_bfgs(_fg(f), x0, maxiter=100)
    assert float(res.fun_val) < float(f(x0))


class TestBoundedScalar:
    def test_parabola_interior(self):
        x, fx = minimize_bounded_scalar(lambda w: (w - 0.3) ** 2, (0.0, 1.0))
        assert np.isclose(float(x), 0.3, atol=1e-4)

    def test_minimum_at_bound(self):
        x, fx = minimize_bounded_scalar(lambda w: w, (0.2, 0.9))
        assert np.isclose(float(x), 0.2, atol=1e-4)

    def test_endpoint_pair_consistency(self):
        # Regression: when fb < fa < f_interior the returned (x, f) must
        # belong to the same candidate (the old nested-where could return
        # x = a with f = fb). Bump in the middle, lowest value at b.
        def f(w):
            return -((2 * w - 1) ** 2) - 0.1 * w

        x, fx = minimize_bounded_scalar(f, (0.0, 1.0), maxiter=0)
        assert np.isclose(float(x), 1.0, atol=1e-6)
        assert np.isclose(float(fx), float(f(jnp.asarray(1.0))), atol=1e-6)
        # pair consistency at several iteration counts
        for it in (0, 1, 3, 10):
            x, fx = minimize_bounded_scalar(f, (0.0, 1.0), maxiter=it)
            assert np.isclose(float(fx), float(f(x)), atol=1e-6)

    def test_matches_scipy_lbfgsb(self):
        def f(w):
            return jnp.sin(5 * w) + 0.5 * w**2

        x, fx = minimize_bounded_scalar(f, (0.0, 1.0), maxiter=40)
        sres = sopt.minimize_scalar(
            lambda w: float(f(jnp.asarray(w))), bounds=(0.0, 1.0), method="bounded"
        )
        assert float(fx) <= sres.fun + 1e-5

    def test_multimodal_grid_seeding(self):
        # broad shallow well near 0.15, narrow DEEP well near 0.85: plain
        # bracketing (and the reference's single-init L-BFGS-B) converges
        # to whichever basin the first probes see; grid seeding finds the
        # global one
        def f(w):
            return -0.5 * jnp.exp(-(((w - 0.15) / 0.1) ** 2)) - 1.0 * jnp.exp(
                -(((w - 0.85) / 0.02) ** 2)
            )

        x_plain, f_plain = minimize_bounded_scalar(f, (0.0, 1.0), maxiter=40)
        assert np.isclose(float(x_plain), 0.15, atol=1e-2)  # wrong basin
        x_grid, f_grid = minimize_bounded_scalar(
            f, (0.0, 1.0), maxiter=40, n_grid_probes=33
        )
        assert np.isclose(float(x_grid), 0.85, atol=1e-3)
        assert float(f_grid) < float(f_plain) - 0.4

    def test_multimodal_vs_reference_lbfgsb(self):
        # The reference solves the handover weight with L-BFGS-B from the
        # single init w0 (src/eincm/solver.py:165-183) — a local method: on
        # a multi-modal landscape it converges to w0's basin. Our
        # grid-seeded solve must end at least as low as the reference's
        # from EVERY init it could plausibly use.
        def f(w):
            return -0.5 * jnp.exp(-(((w - 0.15) / 0.1) ** 2)) - 1.0 * jnp.exp(
                -(((w - 0.85) / 0.02) ** 2)
            )

        _, f_grid = minimize_bounded_scalar(
            f, (0.0, 1.0), maxiter=40, n_grid_probes=33
        )
        for w0 in (0.0, 0.25, 0.5, 1.0):
            sres = sopt.minimize(
                lambda w: float(f(jnp.asarray(w[0]))),
                np.array([w0]),
                method="L-BFGS-B",
                bounds=[(0.0, 1.0)],
            )
            assert float(f_grid) <= sres.fun + 1e-5
        # and the single-init-at-0.5 reference solve provably misses the
        # deep basin here, so the inequality above is strict in that case
        sres = sopt.minimize(
            lambda w: float(f(jnp.asarray(w[0]))),
            np.array([0.5]),
            method="L-BFGS-B",
            bounds=[(0.0, 1.0)],
        )
        assert float(f_grid) < sres.fun - 0.4

    def test_grid_seeding_unimodal_unchanged(self):
        def f(w):
            return (w - 0.3) ** 2

        x, fx = minimize_bounded_scalar(f, (0.0, 1.0), n_grid_probes=9)
        assert np.isclose(float(x), 0.3, atol=1e-4)
        # pair consistency holds with a grid too
        for it in (0, 2, 8):
            x, fx = minimize_bounded_scalar(
                f, (0.0, 1.0), maxiter=it, n_grid_probes=9
            )
            assert np.isclose(float(fx), float(f(x)), atol=1e-6)

    def test_grid_seeding_history(self):
        def f(w):
            return jnp.cos(3 * w)

        (x, fx), hist = minimize_bounded_scalar(
            f, (0.0, 1.0), maxiter=7, record_history=True, n_grid_probes=5
        )
        assert int(hist.n) == 5 + 2 + 7
        xs = np.asarray(hist.xs)
        fs = np.asarray(hist.fs)
        np.testing.assert_allclose(xs[:5], np.linspace(0, 1, 5), atol=1e-6)
        np.testing.assert_allclose(
            fs[: int(hist.n)],
            [float(f(jnp.asarray(v))) for v in xs[: int(hist.n)]],
            atol=1e-6,
        )


def test_history_recording():
    def f(x):
        return ((x - 2.0) ** 2).sum()

    from eincm_tpu.models.bfgs import BFGSHistory

    res, hist = minimize_bfgs(
        _fg(f), jnp.zeros(3), maxiter=20, record_history=True
    )
    n = int(hist.n)
    assert n == int(res.total_iters) and n >= 1
    # losses monotonically improve to the final value
    fs = np.asarray(hist.fs)[:n]
    assert fs[-1] <= fs[0]
    assert np.isclose(fs[-1], float(res.fun_val))
    np.testing.assert_allclose(np.asarray(hist.xs)[n - 1], np.asarray(res.x))


def test_history_in_solve_result():
    from eincm_tpu.models.loss import LossParams
    from eincm_tpu.models.pyramid import (
        HandoverSettings, SolverConfig, WindowSample, solve_window,
    )

    rng = np.random.default_rng(5)
    H = W = 16
    sample = WindowSample(
        xs=jnp.asarray(rng.integers(0, W, 128).astype(np.float32)),
        ys=jnp.asarray(rng.integers(0, H, 128).astype(np.float32)),
        ts=jnp.asarray(rng.uniform(0, 1, 128).astype(np.float32)),
        edges=jnp.asarray(rng.uniform(0, 1, (2, H, W)).astype(np.float32)),
        edge_ts=jnp.asarray([0.0, 1.0], jnp.float32),
    )
    cfg = SolverConfig(
        n_pyr_lvls=2, sensor_size=(H, W),
        params=LossParams(10.0, 5.0),
        theta_opt_maxiters=(4, 4),
        handover=HandoverSettings(use_handover=False),
        max_ls_evals=5, collect_intermediate=True,
    )
    res = solve_window(cfg, sample, cfg.zero_pyramid(), is_first_sample=True)
    assert len(res.theta_histories) == 2
    assert res.theta_histories[0].xs.shape == (4, 2 * 2 * 2)

    from eincm_tpu.experiments.outputs import solve_result_to_record

    rec = solve_result_to_record(res)
    inter = rec["solver_intermediate_results"]["theta_opt"]
    assert "thetas" in inter and "losses" in inter
    assert inter["thetas"]["pyr_lvl_0"].shape[0] == int(res.theta_opt_states[0].total_iters)


def test_armijo_line_search():
    def f(x):
        return (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    res = minimize_bfgs(
        _fg(f), jnp.array([-1.2, 1.0]), maxiter=200, gtol=1e-4,
        line_search="armijo", fun=f,
    )
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=5e-3)
    assert float(res.fun_val) < 1e-5


def test_armijo_interpolated():
    """Quadratic-interpolated backtracking: same minimizer, <= probe count."""
    def f(x):
        return (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    res = {}
    for interp in (False, True):
        res[interp] = minimize_bfgs(
            _fg(f), jnp.array([-1.2, 1.0]), maxiter=200, gtol=1e-4,
            line_search="armijo", fun=f, armijo_interpolate=interp,
        )
        np.testing.assert_allclose(np.asarray(res[interp].x), [1.0, 1.0], atol=5e-3)
        assert float(res[interp].fun_val) < 1e-5
    # on a badly-scaled valley the interpolated probes should not need more
    # evaluations than plain halving to reach the same optimum
    assert int(res[True].n_fun_evals) <= int(res[False].n_fun_evals) * 1.1


def test_armijo_requires_fun():
    with pytest.raises(AssertionError):
        minimize_bfgs(
            _fg(lambda x: (x**2).sum()), jnp.zeros(2), maxiter=5,
            line_search="armijo",
        )


class TestJaxoptCompat:
    """Drop-in ScipyMinimize/ScipyBoundedMinimize wrappers (models/compat.py)."""

    def test_scipy_minimize_rosenbrock(self):
        from eincm_tpu.models.compat import ScipyMinimize

        def rosen(x):
            return ((1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2,
                    {"aux": x.sum()})

        solver = ScipyMinimize(
            fun=rosen, method="BFGS", maxiter=200, has_aux=True,
            options={"gtol": 1e-6},
        )
        res = solver.run(jnp.array([-1.2, 1.0]))
        assert np.allclose(np.asarray(res.params), [1.0, 1.0], atol=1e-3)
        assert float(res.state.fun_val) < 1e-6

    def test_scipy_minimize_callback_trajectory(self):
        from eincm_tpu.models.compat import ScipyMinimize

        seen = []
        solver = ScipyMinimize(
            fun=lambda x: ((x - 3.0) ** 2).sum(), maxiter=30,
            callback=lambda r: seen.append((np.asarray(r.x), float(r.fun))),
        )
        res = solver.run(jnp.zeros(4))
        assert len(seen) >= 2
        # callback sees params in the original shape, losses decreasing
        assert seen[0][0].shape == (4,)
        assert seen[-1][1] <= seen[0][1]
        assert np.allclose(np.asarray(res.params), 3.0, atol=1e-4)

    def test_scipy_bounded_minimize(self):
        from eincm_tpu.models.compat import ScipyBoundedMinimize

        solver = ScipyBoundedMinimize(
            fun=lambda w: (w - 0.7) ** 2, maxiter=40
        )
        res = solver.run(0.5, (0.0, 1.0))
        assert np.isclose(float(res.params), 0.7, atol=1e-4)
        # honest state reporting: a finite in-bounds optimum is a success
        # with the full bracketing schedule counted
        assert bool(res.state.success)
        assert int(res.state.iter_num) == 40

    def test_scipy_bounded_minimize_nan_objective_not_success(self):
        from eincm_tpu.models.compat import ScipyBoundedMinimize

        solver = ScipyBoundedMinimize(
            fun=lambda w: w * jnp.nan, maxiter=10
        )
        res = solver.run(0.5, (0.0, 1.0))
        assert not bool(res.state.success)

    def test_heartbeat_callback_fires(self, capsys):
        from eincm_tpu.models.bfgs import minimize_bfgs

        seen = []

        def beat(k, f):
            seen.append((int(k), float(f)))

        def fg(x):
            return jax.value_and_grad(lambda v: ((v - 2.0) ** 2).sum())(x)

        res = minimize_bfgs(
            fg, jnp.zeros(3), maxiter=10, heartbeat_fn=beat
        )
        jax.effects_barrier()
        assert seen, "heartbeat never fired"
        assert seen[0][0] == 1
        assert seen[-1][1] <= seen[0][1]
        assert float(res.fun_val) < 1e-8
