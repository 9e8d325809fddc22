"""Scan-over-levels multi-level solver: ONE traced level body for all levels.

The per-level build (`pyramid.solve_window`) traces the BFGS machinery and —
dominating trace/compile time — the full loss graph (warp + splat +
objectives, forward AND backward) once per pyramid level: DSEC-scale cold
compiles measured 20-30 min per variant (docs/ARCHITECTURE.md compile-time
accounting). This variant pads every level's flat theta to the finest
level's size and runs the coarse-to-fine loop as a `lax.scan` whose body is
traced once:

- the expensive, level-shape-independent loss tail (`_solver_loss_tail`:
  splat + contrast/correlation) appears once per syntactic call site instead
  of once per call site per level (`models/loss.py:solver_loss_dyn`);
- only the tiny per-level ops (slice + reshape + coarse-grid warp, upscale)
  live under `lax.switch` branches;
- per-level maxiter / handover maxiter / extra-attempt budgets ride the scan
  as traced loop bounds (`minimize_bfgs` / `minimize_bounded_scalar` only
  use them dynamically when history recording is off).

Per-level numerics are the per-level build's: BFGS over the zero-padded
finest-size vector follows the exact same trajectory (padded coordinates
have exactly-zero gradients, so the inverse Hessian stays identity there and
every dot product/line search is unchanged), and the selected loss branch is
the same computation (see `solver_loss_dyn`). Equivalence is asserted by
tests/test_pyramid_scan.py.

Reference: the pyramid loop at src/eincm/solver.py:197-267 — same semantics,
restructured for XLA compile time.

Not supported (falls back to the per-level build via the manager):
`collect_intermediate` (per-level history buffers need per-level static
capacities) and `progress_heartbeat`.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from eincm_tpu.models.bfgs import (
    BFGSResult,
    minimize_bfgs,
    minimize_bounded_scalar,
)
from eincm_tpu.models.loss import (
    compute_window_statics,
    solver_loss,
    solver_loss_dyn,
)
from eincm_tpu.models.pyramid import (
    SolveResult,
    SolverConfig,
    WindowSample,
    stage_prior_pyramid,
)
from eincm_tpu.ops.resize import upscale_theta


def _pad_flat(flat: jax.Array, d_max: int) -> jax.Array:
    return jnp.pad(flat, (0, d_max - flat.shape[0]))


def solve_window_scan(
    cfg: SolverConfig,
    sample: WindowSample,
    prior_pyr: Sequence[jax.Array],
    is_first_sample: bool,
) -> SolveResult:
    """Full coarse-to-fine solve of one event window, one traced level body.

    Drop-in equivalent of `pyramid.solve_window` (same SolveResult pytree);
    see module docstring for the trace-sharing design.
    """
    if cfg.collect_intermediate or cfg.progress_heartbeat:
        raise ValueError(
            "solve_window_scan does not support collect_intermediate / "
            "progress_heartbeat; use the per-level solve_window"
        )
    n = cfg.n_pyr_lvls
    ho = cfg.handover
    shapes = [cfg.level_shape(l) for l in range(n)]
    dims = [h * w * 2 for (h, w) in shapes]
    d_max = dims[0]
    statics = cfg.loss_statics

    wstat = compute_window_statics(
        sample.xs, sample.ys, sample.edges, cfg.sensor_size
    )
    prior = stage_prior_pyramid(cfg, prior_pyr)
    prior_stack = jnp.stack(
        [_pad_flat(p.reshape(-1), d_max) for p in prior]
    )  # (n, d_max)

    if is_first_sample or not cfg.compute_prior_loss:
        prior_loss0 = jnp.asarray(jnp.inf, prior[0].dtype)
    else:
        prior_loss0 = solver_loss(
            prior[0], sample.xs, sample.ys, sample.ts, sample.edges,
            sample.edge_ts, cfg.params, 0, statics, wstat,
        )

    loss_dyn = partial(
        solver_loss_dyn,
        xs=sample.xs,
        ys=sample.ys,
        ts=sample.ts,
        edges=sample.edges,
        edge_ts=sample.edge_ts,
        params=cfg.params,
        statics=statics,
        window_statics=wstat,
        level_shapes=tuple(shapes),
    )

    def fun_only(flat, lvl):
        return loss_dyn(flat, lvl)

    def fun_and_grad(flat, lvl):
        loss, grad = jax.value_and_grad(loss_dyn)(flat, lvl)
        return loss, grad

    # one-step-finer upscale on padded flats: level l content -> level l-1
    def _up_branch(l):
        if l == 0:
            return lambda flat: flat
        h, w = shapes[l]
        d = dims[l]

        def br(flat):
            th = flat[:d].reshape(h, w, 2)
            up = upscale_theta(
                th,
                base=cfg.base_between(l - 1),
                method=cfg.pyramid_upscale_method,
            )
            return _pad_flat(up.reshape(-1), d_max)

        return br

    def upscale_one(lvl, flat):
        return jax.lax.switch(lvl, [_up_branch(l) for l in range(n)], flat)

    # per-level scan inputs (step order: coarsest lvl n-1 -> finest lvl 0)
    order = list(reversed(range(n)))
    lvls = jnp.asarray(order, jnp.int32)
    maxiters = jnp.asarray(
        [cfg.theta_opt_maxiters[l] for l in order], jnp.int32
    )
    # handover solves at the next-finer scale for lvl > 0
    # (reference: src/eincm/solver.py:311-335)
    ho_maxiters = jnp.asarray(
        [cfg.handover_opt_maxiters[max(l - 1, 0)] for l in order], jnp.int32
    )
    n_extras = jnp.asarray(
        [cfg.n_extra_attempts.get(l, 0) for l in order], jnp.int32
    )
    solve_mask = jnp.asarray(
        [l in ho.solve_handover_for_levels for l in order], bool
    )

    def body(pre_opt_pad, per_lvl):
        lvl, maxiter, ho_maxiter, n_extra, do_solve = per_lvl

        res = minimize_bfgs(
            lambda flat: fun_and_grad(flat, lvl),
            pre_opt_pad,
            maxiter=maxiter,
            gtol=cfg.theta_gtol,
            max_ls_evals=cfg.max_ls_evals,
            n_extra_attempts=n_extra,
            record_history=False,
            line_search=cfg.line_search,
            armijo_interpolate=cfg.armijo_interpolate,
            fun=lambda flat: fun_only(flat, lvl),
            ftol=cfg.theta_ftol,
            ftol_patience=cfg.theta_ftol_patience,
        )
        opt_pad = res.x
        prior_pad = prior_stack[lvl]

        if is_first_sample or not ho.use_handover:
            w = jnp.asarray(ho.init_handover_weight, opt_pad.dtype)
            final_pad = opt_pad
        else:

            def _solve_w(operands):
                opt_p, ho_mi = operands
                # lvl > 0: solve at the next-finer scale with the upscaled
                # theta against the finer prior (src/eincm/solver.py:311-335)
                theta_fs = jax.lax.cond(
                    lvl > 0,
                    lambda f: upscale_one(lvl, f),
                    lambda f: f,
                    opt_p,
                )
                prior_fs = prior_stack[jnp.maximum(lvl - 1, 0)]
                loss_lvl = jnp.maximum(lvl - 1, 0)

                def wfun(wv):
                    blend = wv * prior_fs + (1.0 - wv) * theta_fs
                    return loss_dyn(blend, loss_lvl)

                w_star, _ = minimize_bounded_scalar(
                    wfun,
                    ho.handover_limits,
                    maxiter=ho_mi,
                    record_history=False,
                    n_grid_probes=ho.handover_grid_probes,
                )
                if ho.clip_solved_handover:
                    w_star = jnp.clip(
                        w_star, *ho.clip_solved_handover_limits
                    )
                return w_star.astype(opt_p.dtype)

            w = jax.lax.cond(
                do_solve,
                _solve_w,
                lambda _: jnp.asarray(ho.alpha_handover, opt_pad.dtype),
                (opt_pad, ho_maxiter),
            )
            final_pad = w * prior_pad + (1.0 - w) * opt_pad

        next_pre = jax.lax.cond(
            lvl > 0,
            lambda f: upscale_one(lvl, f),
            lambda f: f,
            final_pad,
        )
        ys = (pre_opt_pad, opt_pad, final_pad, w, res)
        return next_pre, ys

    init_pre = prior_stack[n - 1]
    _, (pre_opts, opts, finals, weights, states) = jax.lax.scan(
        body,
        init_pre,
        (lvls, maxiters, ho_maxiters, n_extras, solve_mask),
    )

    def at_level(stacked, l):
        """ys row for level l, unpadded to the level's theta shape."""
        i = n - 1 - l
        return stacked[i, : dims[l]].reshape(*shapes[l], 2)

    opt_states = tuple(
        BFGSResult(
            x=states.x[n - 1 - l, : dims[l]],
            fun_val=states.fun_val[n - 1 - l],
            grad=states.grad[n - 1 - l, : dims[l]],
            iter_num=states.iter_num[n - 1 - l],
            total_iters=states.total_iters[n - 1 - l],
            n_fun_evals=states.n_fun_evals[n - 1 - l],
            n_attempts=states.n_attempts[n - 1 - l],
            success=states.success[n - 1 - l],
            status=states.status[n - 1 - l],
        )
        for l in range(n)
    )

    return SolveResult(
        prior_theta_pyr=tuple(prior),
        pre_opt_theta_pyr=tuple(at_level(pre_opts, l) for l in range(n)),
        pre_handover_theta_pyr=tuple(at_level(opts, l) for l in range(n)),
        final_theta_pyr=tuple(at_level(finals, l) for l in range(n)),
        theta_opt_states=opt_states,
        final_handover_weights=tuple(
            weights[n - 1 - l] for l in range(n)
        ),
        theta_histories=(),
        handover_histories=(),
        prior_loss_lvl0=prior_loss0,
    )


def make_window_solver_scan(cfg: SolverConfig):
    """Jitted (sample, prior_pyr, is_first) -> SolveResult, scan variant."""
    first_fn = jax.jit(partial(solve_window_scan, cfg, is_first_sample=True))
    rest_fn = jax.jit(partial(solve_window_scan, cfg, is_first_sample=False))

    def run(sample: WindowSample, prior_pyr, is_first: bool) -> SolveResult:
        fn = first_fn if is_first else rest_fn
        return fn(sample, prior_pyr)

    return run
