"""End-to-end multi-level solve on synthetic events with known flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eincm_tpu.models.loss import LossParams
from eincm_tpu.models.pyramid import (
    HandoverSettings,
    SolverConfig,
    WindowSample,
    make_window_solver,
    solve_window,
)
from eincm_tpu.ops.filters import gaussian_blur_3x3
from eincm_tpu.ops.normalize import normalize_to_unit_range
from eincm_tpu.ops.resize import scale_theta_to_sensor_size
from eincm_tpu.ops.splat import events_to_pdf_frame


def make_scene(rng, H=48, W=48, v=(2.0, -1.5), n_feat=40, n_ev=4096):
    """Moving-dots scene: features translate with constant velocity v."""
    feat = rng.uniform(6, min(H, W) - 10, size=(n_feat, 2))
    ts = rng.uniform(0, 1, n_ev).astype(np.float32)
    which = rng.integers(0, n_feat, n_ev)
    xs = np.round(feat[which, 0] + v[0] * ts).astype(np.float32)
    ys = np.round(feat[which, 1] + v[1] * ts).astype(np.float32)

    def edge_map(t):
        ex = jnp.asarray(feat[:, 0] + v[0] * t)
        ey = jnp.asarray(feat[:, 1] + v[1] * t)
        m = events_to_pdf_frame(ex, ey, (H, W))
        return normalize_to_unit_range(gaussian_blur_3x3(m))

    edges = jnp.stack([edge_map(0.0), edge_map(1.0)])
    edge_ts = jnp.array([0.0, 1.0], jnp.float32)
    sample = WindowSample(
        xs=jnp.asarray(xs), ys=jnp.asarray(ys), ts=jnp.asarray(ts),
        edges=edges, edge_ts=edge_ts,
    )
    return sample, np.asarray(v)


def base_cfg(H=48, W=48, **kw):
    defaults = dict(
        n_pyr_lvls=4,
        sensor_size=(H, W),
        params=LossParams(alpha=60.0, beta=0.0),
        theta_opt_maxiters=(20, 15, 10, 10),
        theta_gtol=1e-4,
        handover=HandoverSettings(use_handover=True),
    )
    defaults.update(kw)
    return SolverConfig(**defaults)


class TestSolveWindow:
    def test_recovers_constant_flow(self, rng):
        sample, v = make_scene(rng)
        cfg = base_cfg()
        res = solve_window(cfg, sample, cfg.zero_pyramid(), is_first_sample=True)

        full = np.asarray(
            scale_theta_to_sensor_size(res.final_theta_pyr[0], cfg.sensor_size)
        )
        iy = np.asarray(sample.ys).astype(int)
        ix = np.asarray(sample.xs).astype(int)
        aee = np.linalg.norm(full[iy, ix] - v[None, :], axis=-1).mean()
        aee_zero = np.linalg.norm(v)
        assert aee < 0.5 * aee_zero, f"AEE {aee} vs zero-theta {aee_zero}"

    def test_pyramid_shapes(self, rng):
        sample, _ = make_scene(rng)
        cfg = base_cfg()
        res = solve_window(cfg, sample, cfg.zero_pyramid(), is_first_sample=True)
        for lvl in range(cfg.n_pyr_lvls):
            assert res.final_theta_pyr[lvl].shape == (*cfg.level_shape(lvl), 2)
        assert cfg.level_shape(0) == (8, 8)
        assert cfg.level_shape(3) == (1, 1)

    def test_first_sample_skips_handover(self, rng):
        sample, _ = make_scene(rng)
        cfg = base_cfg()
        res = solve_window(cfg, sample, cfg.zero_pyramid(), is_first_sample=True)
        for lvl in range(cfg.n_pyr_lvls):
            np.testing.assert_array_equal(
                np.asarray(res.final_theta_pyr[lvl]),
                np.asarray(res.pre_handover_theta_pyr[lvl]),
            )

    def test_fixed_handover_blend(self, rng):
        sample, _ = make_scene(rng)
        cfg = base_cfg(
            handover=HandoverSettings(use_handover=True, alpha_handover=0.3),
        )
        first = solve_window(cfg, sample, cfg.zero_pyramid(), is_first_sample=True)
        second = solve_window(
            cfg, sample, first.final_theta_pyr, is_first_sample=False
        )
        for lvl in range(cfg.n_pyr_lvls):
            w = float(second.final_handover_weights[lvl])
            assert np.isclose(w, 0.3)
            blended = (
                w * np.asarray(second.prior_theta_pyr[lvl])
                + (1 - w) * np.asarray(second.pre_handover_theta_pyr[lvl])
            )
            np.testing.assert_allclose(
                np.asarray(second.final_theta_pyr[lvl]), blended, rtol=1e-5
            )

    def test_solved_handover_weight_in_bounds(self, rng):
        sample, _ = make_scene(rng)
        cfg = base_cfg(
            handover=HandoverSettings(
                use_handover=True,
                solve_handover_for_levels=(0,),
                handover_limits=(0.0, 1.0),
            ),
            handover_opt_maxiters=(8, 8, 8, 8),
        )
        first = solve_window(cfg, sample, cfg.zero_pyramid(), is_first_sample=True)
        second = solve_window(
            cfg, sample, first.final_theta_pyr, is_first_sample=False
        )
        w0 = float(second.final_handover_weights[0])
        assert 0.0 <= w0 <= 1.0

    def test_make_window_solver_jit(self, rng):
        sample, v = make_scene(rng)
        cfg = base_cfg(n_pyr_lvls=3, theta_opt_maxiters=(10, 8, 8))
        solver = make_window_solver(cfg)
        res = solver(sample, cfg.zero_pyramid(), is_first=True)
        res2 = solver(sample, res.final_theta_pyr, is_first=False)
        assert np.all(np.isfinite(np.asarray(res2.final_theta_pyr[0])))

    def test_downscaled_finest_priors(self, rng):
        sample, _ = make_scene(rng)
        cfg = base_cfg(
            handover=HandoverSettings(
                use_handover=True, use_downscaled_finest_priors=True
            ),
        )
        first = solve_window(cfg, sample, cfg.zero_pyramid(), is_first_sample=True)
        second = solve_window(
            cfg, sample, first.final_theta_pyr, is_first_sample=False
        )
        # prior at level 1 must equal the downscaled level-0 prior
        from eincm_tpu.ops.resize import downscale_theta

        expect = np.asarray(
            downscale_theta(first.final_theta_pyr[0], base=2, method="bilinear")
        )
        np.testing.assert_allclose(
            np.asarray(second.prior_theta_pyr[1]), expect, rtol=1e-5
        )


def test_armijo_solver_recovers_flow(rng):
    sample, v = make_scene(rng)
    cfg = base_cfg(line_search="armijo")
    res = solve_window(cfg, sample, cfg.zero_pyramid(), is_first_sample=True)
    full = np.asarray(
        scale_theta_to_sensor_size(res.final_theta_pyr[0], cfg.sensor_size)
    )
    iy = np.asarray(sample.ys).astype(int)
    ix = np.asarray(sample.xs).astype(int)
    aee = np.linalg.norm(full[iy, ix] - v[None, :], axis=-1).mean()
    assert aee < 0.5 * np.linalg.norm(v)


def test_armijo_interpolated_solver_recovers_flow(rng):
    """Opt-in quadratic-interpolated backtracking through the full pyramid
    solve (knob plumbing SolverConfig -> minimize_bfgs and end accuracy)."""
    sample, v = make_scene(rng)
    cfg = base_cfg(line_search="armijo", armijo_interpolate=True)
    res = solve_window(cfg, sample, cfg.zero_pyramid(), is_first_sample=True)
    full = np.asarray(
        scale_theta_to_sensor_size(res.final_theta_pyr[0], cfg.sensor_size)
    )
    iy = np.asarray(sample.ys).astype(int)
    ix = np.asarray(sample.xs).astype(int)
    aee = np.linalg.norm(full[iy, ix] - v[None, :], axis=-1).mean()
    assert aee < 0.5 * np.linalg.norm(v)


def test_rotational_flow_recovery():
    """Recover a SPATIALLY-VARYING (rotational) flow field — the capability
    the per-pixel theta exists for; constant-velocity recovery alone cannot
    distinguish per-pixel flow from a global translation model. Contrast
    objective only: the correlation term's reference sign structure fights
    alignment on naive synthetic edge maps (see PARITY.md deviations)."""
    import numpy as np

    from eincm_tpu.models.loss import LossParams
    from eincm_tpu.models.pyramid import (
        HandoverSettings,
        SolverConfig,
        WindowSample,
        solve_window,
    )
    from eincm_tpu.ops.filters import gaussian_blur_3x3
    from eincm_tpu.ops.normalize import normalize_to_unit_range
    from eincm_tpu.ops.resize import scale_theta_to_sensor_size
    from eincm_tpu.ops.splat import events_to_pdf_frame

    H = W = 48
    cx = cy = 24.0
    omega = 0.1  # rad / unit time; rim speed ~2.4 px
    rng = np.random.default_rng(5)
    n_feat, n_ev = 60, 6144
    feat = rng.uniform(6, 42, (n_feat, 2))

    def pos(f, t):
        dx, dy = f[:, 0] - cx, f[:, 1] - cy
        c, s = np.cos(omega * t), np.sin(omega * t)
        return np.stack([cx + c * dx - s * dy, cy + s * dx + c * dy], 1)

    ts = rng.uniform(0, 1, n_ev).astype(np.float32)
    which = rng.integers(0, n_feat, n_ev)
    f = feat[which]
    fdx, fdy = f[:, 0] - cx, f[:, 1] - cy
    ca, sa = np.cos(omega * ts), np.sin(omega * ts)
    xs = np.round(cx + ca * fdx - sa * fdy).astype(np.float32)
    ys = np.round(cy + sa * fdx + ca * fdy).astype(np.float32)

    def edge_map(t):
        q = pos(feat, t)
        m = events_to_pdf_frame(jnp.asarray(q[:, 0]), jnp.asarray(q[:, 1]), (H, W))
        return normalize_to_unit_range(gaussian_blur_3x3(m))

    sample = WindowSample(
        xs=jnp.asarray(xs),
        ys=jnp.asarray(ys),
        ts=jnp.asarray(ts),
        edges=jnp.stack([edge_map(0.0), edge_map(1.0)]),
        edge_ts=jnp.asarray([0.0, 1.0], jnp.float32),
    )
    cfg = SolverConfig(
        n_pyr_lvls=3,
        sensor_size=(H, W),
        params=LossParams(alpha=40.0, beta=0.0, gamma=0.001),
        theta_opt_maxiters=(16, 10, 8),
        handover=HandoverSettings(use_handover=False),
        max_ls_evals=6,
    )
    res = solve_window(cfg, sample, tuple(cfg.zero_pyramid(jnp.float32)), True)
    th = np.asarray(
        scale_theta_to_sensor_size(res.final_theta_pyr[0], (H, W), "bilinear")
    )

    gy, gx = np.mgrid[0:H, 0:W].astype(np.float64)
    dx, dy = gx - cx, gy - cy
    c, s = np.cos(omega), np.sin(omega)
    gt = np.stack([(c - 1) * dx - s * dy, s * dx + (c - 1) * dy], -1)

    mask = np.zeros((H, W), bool)
    mask[ys.astype(int), xs.astype(int)] = True
    err = np.linalg.norm(th - gt, axis=-1)[mask]
    mag = np.linalg.norm(gt, axis=-1)[mask]
    # the recovered field must follow the rotation, not a constant fit: a
    # best constant field leaves AEE ~= the field's own spatial spread
    assert err.mean() < 0.4 * mag.mean(), (err.mean(), mag.mean())
    const_err = np.linalg.norm(
        th[mask] - th[mask].mean(0, keepdims=True), axis=-1
    ).mean()
    assert const_err > 0.2 * mag.mean()  # genuinely non-uniform solution


def test_diverging_flow_recovery():
    """Recover a DIVERGING (zoom) field — radial expansion about the center,
    the other canonical spatially-varying pattern (camera approach). Same
    protocol and bounds as the rotational test; a constant-velocity fit has
    zero divergence, so passing requires per-pixel structure.

    Expansion rate 0.15 (rim displacement ~3.6 px, mean ~2.5): measured
    err/|gt| = 0.28 here. Weaker zooms fall under the integer-rounding noise
    floor of the synthetic events (a=0.08, mean displacement 1.2 px, reads
    0.53 with the radial coefficient recovered at ~0.6x — an input SNR
    limit, not a solver regression; larger a also measured recovering the
    coefficient at ~0.8x of truth, of which ~7% is the t-averaged gt
    convention used below)."""
    import numpy as np

    from eincm_tpu.models.loss import LossParams
    from eincm_tpu.models.pyramid import (
        HandoverSettings,
        SolverConfig,
        WindowSample,
        solve_window,
    )
    from eincm_tpu.ops.filters import gaussian_blur_3x3
    from eincm_tpu.ops.normalize import normalize_to_unit_range
    from eincm_tpu.ops.resize import scale_theta_to_sensor_size
    from eincm_tpu.ops.splat import events_to_pdf_frame

    H = W = 48
    cx = cy = 24.0
    a = 0.15  # expansion per unit time; rim displacement ~3.6 px
    rng = np.random.default_rng(9)
    n_feat, n_ev = 60, 6144
    feat = rng.uniform(6, 42, (n_feat, 2))

    ts = rng.uniform(0, 1, n_ev).astype(np.float32)
    which = rng.integers(0, n_feat, n_ev)
    f = feat[which]
    xs = np.round(cx + (1 + a * ts) * (f[:, 0] - cx)).astype(np.float32)
    ys = np.round(cy + (1 + a * ts) * (f[:, 1] - cy)).astype(np.float32)
    keep = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
    xs, ys, ts = xs[keep], ys[keep], ts[keep]

    def edge_map(t):
        qx = cx + (1 + a * t) * (feat[:, 0] - cx)
        qy = cy + (1 + a * t) * (feat[:, 1] - cy)
        m = events_to_pdf_frame(jnp.asarray(qx), jnp.asarray(qy), (H, W))
        return normalize_to_unit_range(gaussian_blur_3x3(m))

    sample = WindowSample(
        xs=jnp.asarray(xs),
        ys=jnp.asarray(ys),
        ts=jnp.asarray(ts),
        edges=jnp.stack([edge_map(0.0), edge_map(1.0)]),
        edge_ts=jnp.asarray([0.0, 1.0], jnp.float32),
    )
    cfg = SolverConfig(
        n_pyr_lvls=3,
        sensor_size=(H, W),
        params=LossParams(alpha=40.0, beta=0.0, gamma=0.001),
        theta_opt_maxiters=(16, 10, 8),
        handover=HandoverSettings(use_handover=False),
        max_ls_evals=6,
    )
    res = solve_window(cfg, sample, tuple(cfg.zero_pyramid(jnp.float32)), True)
    th = np.asarray(
        scale_theta_to_sensor_size(res.final_theta_pyr[0], (H, W), "bilinear")
    )

    gy, gx = np.mgrid[0:H, 0:W].astype(np.float64)
    gt = np.stack([a * (gx - cx), a * (gy - cy)], -1)

    mask = np.zeros((H, W), bool)
    mask[ys.astype(int), xs.astype(int)] = True
    err = np.linalg.norm(th - gt, axis=-1)[mask]
    mag = np.linalg.norm(gt, axis=-1)[mask]
    assert err.mean() < 0.4 * mag.mean(), (err.mean(), mag.mean())
    const_err = np.linalg.norm(
        th[mask] - th[mask].mean(0, keepdims=True), axis=-1
    ).mean()
    assert const_err > 0.2 * mag.mean()  # genuinely non-uniform solution


def test_shear_flow_recovery():
    """Recover a SHEAR field (dx = s*(y - cy), dy = 0) — with rotation
    (curl) and zoom (divergence) this completes the first-order flow
    decomposition; shear is the ground-plane pattern under forward motion.
    Measured err/|gt| = 0.11 at s = 0.15 (rim displacement 3.6 px)."""
    import numpy as np

    from eincm_tpu.models.loss import LossParams
    from eincm_tpu.models.pyramid import (
        HandoverSettings,
        SolverConfig,
        WindowSample,
        solve_window,
    )
    from eincm_tpu.ops.filters import gaussian_blur_3x3
    from eincm_tpu.ops.normalize import normalize_to_unit_range
    from eincm_tpu.ops.resize import scale_theta_to_sensor_size
    from eincm_tpu.ops.splat import events_to_pdf_frame

    H = W = 48
    cy = 24.0
    s = 0.15
    rng = np.random.default_rng(9)
    n_feat, n_ev = 60, 6144
    feat = rng.uniform(6, 42, (n_feat, 2))

    ts = rng.uniform(0, 1, n_ev).astype(np.float32)
    which = rng.integers(0, n_feat, n_ev)
    f = feat[which]
    xs = np.round(f[:, 0] + s * ts * (f[:, 1] - cy)).astype(np.float32)
    ys = np.round(f[:, 1]).astype(np.float32)
    keep = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
    xs, ys, ts = xs[keep], ys[keep], ts[keep]

    def edge_map(t):
        qx = feat[:, 0] + s * t * (feat[:, 1] - cy)
        m = events_to_pdf_frame(jnp.asarray(qx), jnp.asarray(feat[:, 1]), (H, W))
        return normalize_to_unit_range(gaussian_blur_3x3(m))

    sample = WindowSample(
        xs=jnp.asarray(xs),
        ys=jnp.asarray(ys),
        ts=jnp.asarray(ts),
        edges=jnp.stack([edge_map(0.0), edge_map(1.0)]),
        edge_ts=jnp.asarray([0.0, 1.0], jnp.float32),
    )
    cfg = SolverConfig(
        n_pyr_lvls=3,
        sensor_size=(H, W),
        params=LossParams(alpha=40.0, beta=0.0, gamma=0.001),
        theta_opt_maxiters=(16, 10, 8),
        handover=HandoverSettings(use_handover=False),
        max_ls_evals=6,
    )
    res = solve_window(cfg, sample, tuple(cfg.zero_pyramid(jnp.float32)), True)
    th = np.asarray(
        scale_theta_to_sensor_size(res.final_theta_pyr[0], (H, W), "bilinear")
    )

    gy, gx = np.mgrid[0:H, 0:W].astype(np.float64)
    gt = np.stack([s * (gy - cy), np.zeros_like(gy)], -1)

    mask = np.zeros((H, W), bool)
    mask[ys.astype(int), xs.astype(int)] = True
    err = np.linalg.norm(th - gt, axis=-1)[mask]
    mag = np.linalg.norm(gt, axis=-1)[mask]
    assert err.mean() < 0.4 * mag.mean(), (err.mean(), mag.mean())
    const_err = np.linalg.norm(
        th[mask] - th[mask].mean(0, keepdims=True), axis=-1
    ).mean()
    assert const_err > 0.2 * mag.mean()  # genuinely non-uniform solution
