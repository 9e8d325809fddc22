"""Joint solver-knob smoke matrix.

Most SolverConfig knobs are individually tested, but their *combinations*
(line search x handover variants x trajectory collection x pyramid resample
methods x retry x probe budgets) each trace a different jitted solve — this
module compiles and runs a curated set of joint configurations that no other
test exercises together, asserting the solve stays finite and every
requested output is actually produced.

Each combo costs a fresh ~40-70 s CPU compile of the whole-window solve, so
the module is `slow` (excluded from the fast development loop).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from eincm_tpu.models.loss import LossParams
from eincm_tpu.models.pyramid import (
    HandoverSettings,
    SolverConfig,
    WindowSample,
    make_window_solver,
)

pytestmark = pytest.mark.slow

SENSOR = (16, 20)


@pytest.fixture(scope="module")
def sample():
    rng = np.random.default_rng(1234)
    n = 300
    xs = jnp.asarray(rng.integers(0, SENSOR[1], n).astype(np.float32))
    ys = jnp.asarray(rng.integers(0, SENSOR[0], n).astype(np.float32))
    ts = jnp.asarray(np.sort(rng.uniform(0, 1, n)).astype(np.float32))
    edges = jnp.asarray(rng.uniform(0, 1, (2, *SENSOR)).astype(np.float32))
    return WindowSample(xs, ys, ts, edges, jnp.array([0.0, 1.0], jnp.float32))


def _cfg(**kw):
    base = dict(
        n_pyr_lvls=2,
        sensor_size=SENSOR,
        params=LossParams(alpha=20.0, beta=35.0, gamma=0.0025, delta=0.0),
        theta_opt_maxiters=(3, 2),
        theta_gtol=1e-4,
    )
    base.update(kw)
    return SolverConfig(**base)


COMBOS = {
    # every armijo extra at once: interpolated backtracking, tight probe cap,
    # solved+grid-seeded handover, trajectory collection, rescue signal
    "armijo_all_on": dict(
        line_search="armijo",
        armijo_interpolate=True,
        max_ls_evals=4,
        handover=HandoverSettings(
            use_handover=True,
            solve_handover_for_levels=(0,),
            handover_grid_probes=4,
        ),
        collect_intermediate=True,
        compute_prior_loss=True,
    ),
    # wolfe with clipped solved handover at BOTH levels + retry at level 0
    "wolfe_clip_retry": dict(
        line_search="wolfe",
        max_ls_evals=10,
        n_extra_attempts={0: 1},
        handover=HandoverSettings(
            use_handover=True,
            solve_handover_for_levels=(0, 1),
            clip_solved_handover=True,
            clip_solved_handover_limits=(0.2, 0.9),
        ),
        collect_intermediate=True,
    ),
    # fixed-weight handover without downscaled finest priors, non-default
    # blend weight, interpolating pyramid resamplers everywhere
    "fixed_blend_resample": dict(
        line_search="armijo",
        handover=HandoverSettings(
            use_handover=True,
            use_downscaled_finest_priors=False,
            alpha_handover=0.3,
        ),
        pyramid_upscale_method="bilinear",
        pyramid_downscale_method="lanczos3",
        scale_to_sensor_size_method="cubic",
    ),
    # handover disabled entirely + minimal probe budget
    "no_handover_cap4": dict(
        line_search="armijo",
        max_ls_evals=4,
        handover=HandoverSettings(use_handover=False),
    ),
    # non-uniform pyramid bases (4 then 2): finest level 8x8, mid 2x2
    "nonuniform_bases": dict(
        n_pyr_lvls=3,
        theta_opt_maxiters=(2, 2, 2),
        pyramid_bases=(2, 4),
        handover=HandoverSettings(
            use_handover=True, solve_handover_for_levels=(1,)
        ),
    ),
    # degenerate single-level pyramid: theta is one global velocity
    "single_level": dict(
        n_pyr_lvls=1,
        theta_opt_maxiters=(4,),
        handover=HandoverSettings(
            use_handover=True, solve_handover_for_levels=(0,)
        ),
    ),
}


@pytest.mark.parametrize("name", sorted(COMBOS))
def test_combo_solves(name, sample):
    cfg = _cfg(**COMBOS[name])
    solver = make_window_solver(cfg)
    # is_first=False so the handover path (the knob-rich branch) is traced
    res = solver(sample, cfg.zero_pyramid(), is_first=False)

    for lvl in range(cfg.n_pyr_lvls):
        th = np.asarray(res.final_theta_pyr[lvl])
        assert th.shape == (*cfg.level_shape(lvl), 2)
        assert np.all(np.isfinite(th)), f"{name}: level {lvl} theta not finite"
        st = res.theta_opt_states[lvl]
        assert np.isfinite(float(st.fun_val))
        assert int(st.n_fun_evals) >= 1
        assert int(st.total_iters) >= int(st.iter_num)

    # requested outputs actually materialize
    if cfg.collect_intermediate:
        assert len(res.theta_histories) == cfg.n_pyr_lvls
        assert all(h is not None for h in res.theta_histories)
    if cfg.compute_prior_loss:
        assert np.isfinite(float(res.prior_loss_lvl0))

    ho = cfg.handover
    if ho.use_handover:
        lo, hi = ho.handover_limits
        if ho.clip_solved_handover:
            lo, hi = ho.clip_solved_handover_limits
        for lvl in ho.solve_handover_for_levels:
            w = float(res.final_handover_weights[lvl])
            assert lo - 1e-6 <= w <= hi + 1e-6, f"{name}: w={w} outside [{lo},{hi}]"

    # retry accounting is consistent with the configured attempt budget
    for lvl, extra in cfg.n_extra_attempts.items():
        assert 1 <= int(res.theta_opt_states[lvl].n_attempts) <= 1 + extra
