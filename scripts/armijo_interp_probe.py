"""Probe: does quadratic-interpolated Armijo backtracking cut probe count?

The MVSEC-scale solve is compute-bound on genuine loss evaluations
(TODO.md): ~40 value&grad iterations plus ~3 value-only probes per accepted
step. Plain halving shrinks alpha 2x per failed probe; scipy's
`scalar_search_armijo` instead jumps to the minimizer of the quadratic
through (0, f0), slope dphi0, and the failed (alpha, f) — shrinking up to
10x when badly overshot and landing near the Armijo boundary when barely
failing. Fewer probes = fewer forward passes = lower solve latency, IF the
accepted steps stay as good (same final loss / iteration count).

Protocol (paired, MVSEC scale, rotated-velocity windows, level-0 chains —
same harness as scripts/hessian_warmstart_probe.py): solve each window from
the SAME init (previous baseline solution) with halving vs interpolated
backtracking; compare iterations, loss evaluations, final loss, wall clock.

Run on the real TPU:  python scripts/armijo_interp_probe.py
"""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

# the host sitecustomize force-registers the TPU plugin and resets
# jax_platforms, so JAX_PLATFORMS=cpu alone is not enough for a CPU run
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from eincm_tpu.models.bfgs import minimize_bfgs
from eincm_tpu.models.loss import LossParams, compute_window_statics, solver_loss
from eincm_tpu.models.pyramid import SolverConfig
from eincm_tpu.ops.splat import set_splat_impl
from eincm_tpu.utils.benchmarks import MVSEC_H, MVSEC_W, stage_mvsec_windows

N_WINDOWS = 6
MAXITER = 40
GTOL = 1e-4


def main():
    if jax.default_backend() != "cpu":
        set_splat_impl("pallas_banded")
    cfg = SolverConfig(
        n_pyr_lvls=5,
        sensor_size=(MVSEC_H, MVSEC_W),
        params=LossParams(alpha=20.0, beta=35.0, gamma=0.0, delta=0.0),
        theta_opt_maxiters=(MAXITER,) * 5,
    )
    statics = cfg.loss_statics
    shape = (*cfg.level_shape(0), 2)
    d = int(np.prod(shape))

    staged, _ = stage_mvsec_windows(N_WINDOWS, rotate_deg=15.0)
    wstats = [
        compute_window_statics(s.xs, s.ys, s.edges, cfg.sensor_size)
        for s in staged
    ]

    from functools import partial

    @partial(jax.jit, static_argnames=("interp",))
    def solve_lvl0(x0, sample, wstat, interp):
        def fun_and_grad(flat):
            loss, grad = jax.value_and_grad(solver_loss)(
                flat.reshape(shape), sample.xs, sample.ys, sample.ts,
                sample.edges, sample.edge_ts, cfg.params, 0, statics, wstat,
            )
            return loss, grad.reshape(-1)

        def fun_only(flat):
            return solver_loss(
                flat.reshape(shape), sample.xs, sample.ys, sample.ts,
                sample.edges, sample.edge_ts, cfg.params, 0, statics, wstat,
            )

        return minimize_bfgs(
            fun_and_grad, x0, maxiter=MAXITER, gtol=GTOL,
            max_ls_evals=cfg.max_ls_evals, line_search="armijo",
            fun=fun_only, armijo_interpolate=interp,
        )

    # baseline chain defines the shared inits
    base = []
    x = jnp.zeros((d,), jnp.float32)
    for k in range(N_WINDOWS):
        r = solve_lvl0(x, staged[k], wstats[k], False)
        float(r.fun_val)  # sync (axon relay: block_until_ready is a no-op)
        base.append(r)
        x = r.x

    print(
        f"# lvl-0 armijo halving (H) vs interpolated (Q), {MVSEC_H}x{MVSEC_W},"
        f" 30k events, gtol {GTOL}, maxiter {MAXITER}, 15 deg/window rotation"
    )
    print(
        f"{'win':>3} {'it_H':>5} {'ev_H':>5} {'it_Q':>5} {'ev_Q':>5} "
        f"{'f_H':>12} {'f_Q':>12} {'dtheta_max':>10}"
    )
    tot = np.zeros(4, np.int64)
    for k in range(1, N_WINDOWS):
        x0 = base[k - 1].x
        rH = base[k]
        rQ = solve_lvl0(x0, staged[k], wstats[k], True)
        float(rQ.fun_val)
        dth = float(jnp.max(jnp.abs(rQ.x - rH.x)))
        print(
            f"{k:>3} {int(rH.total_iters):>5} {int(rH.n_fun_evals):>5} "
            f"{int(rQ.total_iters):>5} {int(rQ.n_fun_evals):>5} "
            f"{float(rH.fun_val):>12.6f} {float(rQ.fun_val):>12.6f} "
            f"{dth:>10.4f}"
        )
        tot += [
            int(rH.total_iters), int(rH.n_fun_evals),
            int(rQ.total_iters), int(rQ.n_fun_evals),
        ]
    print(
        f"TOT iters H={tot[0]} Q={tot[2]} "
        f"({100 * (tot[2] - tot[0]) / max(tot[0], 1):+.0f}%)  "
        f"evals H={tot[1]} Q={tot[3]} "
        f"({100 * (tot[3] - tot[1]) / max(tot[1], 1):+.0f}%)"
    )

    # paired wall-clock over the chain (one sync per pass)
    for tag, interp in (("halving", False), ("interp", True)):
        ts_samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            xx = base[0].x
            for k in range(1, N_WINDOWS):
                r = solve_lvl0(xx, staged[k], wstats[k], interp)
                xx = r.x
            float(r.fun_val)
            ts_samples.append((time.perf_counter() - t0) / (N_WINDOWS - 1))
        print(f"lvl0 chain {tag}: p50 {np.median(ts_samples) * 1e3:.1f} ms/window")

    # full-pyramid window solve A/B on the shipped bench workload
    if jax.default_backend() != "cpu":
        from eincm_tpu.utils.benchmarks import (
            build_mvsec_solve_bench,
            solve_diag_str,
        )

        for tag, interp in (("halving", False), ("interp", True)):
            one_round, res = build_mvsec_solve_bench(
                solver_overrides={"armijo_interpolate": interp}
            )
            samples = sorted(one_round() for _ in range(5))
            print(
                f"window solve {tag}: p50 {samples[2] * 1e3:.1f} ms "
                f"(best {samples[0] * 1e3:.1f})  [{solve_diag_str(res)}]"
            )


if __name__ == "__main__":
    main()
