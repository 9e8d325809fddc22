"""Probe: is the BFGS inverse-Hessian transferable across event windows?

Motivation: a sequential solve chains windows through the theta prior, but
every window's BFGS restarts from H = I. If the loss curvature at the
optimum is similar window-to-window (same scene, smoothly varying flow),
warm-starting H from the previous window's final inverse-Hessian could cut
iterations — a beyond-reference lever (the reference's scipy BFGS has no
warm-start path, src/eincm/solver.py:165-183).

Protocol (paired, MVSEC scale, rotated-velocity windows — the honest bench
workload): solve the level-0 objective for each window k from the SAME init
(window k-1's baseline solution) twice — H0 = I vs H0 = window k-1's final
H — and compare iterations / loss evaluations / final loss. The baseline
chain defines both the inits and the carried Hessians, so the two variants
see identical (x0, objective) pairs.

Run on the real TPU:  python scripts/hessian_warmstart_probe.py
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
import jax.numpy as jnp
import numpy as np

from eincm_tpu.models.bfgs import minimize_bfgs
from eincm_tpu.models.loss import LossParams, compute_window_statics, solver_loss
from eincm_tpu.models.pyramid import SolverConfig
from eincm_tpu.ops.splat import set_splat_impl
from eincm_tpu.utils.benchmarks import (
    MVSEC_H,
    MVSEC_W,
    stage_mvsec_windows,
)

N_WINDOWS = 6
MAXITER = 40
GTOL = 1e-4
LINE_SEARCH = "armijo"  # shipped default


def main():
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

    staged, vels = stage_mvsec_windows(N_WINDOWS, rotate_deg=15.0)

    @jax.jit
    def solve_lvl0(x0, h0, sample, wstat):
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

        res, h_inv = minimize_bfgs(
            fun_and_grad, x0, maxiter=MAXITER, gtol=GTOL,
            max_ls_evals=cfg.max_ls_evals, line_search=LINE_SEARCH,
            fun=fun_only, h0=h0, return_h_inv=True,
        )
        return res, h_inv

    wstats = [
        compute_window_statics(s.xs, s.ys, s.edges, cfg.sensor_size)
        for s in staged
    ]
    eye = jnp.eye(d, dtype=jnp.float32)

    # baseline chain: each window from the previous baseline solution, H = I
    base_res, base_h = [], []
    x = jnp.zeros((d,), jnp.float32)
    for k in range(N_WINDOWS):
        r, h = solve_lvl0(x, eye, staged[k], wstats[k])
        float(r.fun_val)  # sync (axon relay: block_until_ready is a no-op)
        base_res.append(r)
        base_h.append(h)
        x = r.x

    # warm variant: same inits, H0 = previous window's final inverse-Hessian
    print(
        f"# lvl-0 {LINE_SEARCH} solves, {MVSEC_H}x{MVSEC_W}, 30k events, "
        f"gtol {GTOL}, maxiter {MAXITER}, 15 deg/window rotation"
    )
    print(
        f"{'win':>3} {'it_I':>5} {'ev_I':>5} {'it_H':>5} {'ev_H':>5} "
        f"{'f_I':>12} {'f_H':>12} {'dtheta_max':>10}"
    )
    tot = np.zeros(4, np.int64)
    for k in range(1, N_WINDOWS):
        x0 = base_res[k - 1].x
        rI = base_res[k]
        rH, _ = solve_lvl0(x0, base_h[k - 1], staged[k], wstats[k])
        float(rH.fun_val)
        dth = float(jnp.max(jnp.abs(rH.x - rI.x)))
        print(
            f"{k:>3} {int(rI.total_iters):>5} {int(rI.n_fun_evals):>5} "
            f"{int(rH.total_iters):>5} {int(rH.n_fun_evals):>5} "
            f"{float(rI.fun_val):>12.6f} {float(rH.fun_val):>12.6f} "
            f"{dth:>10.4f}"
        )
        tot += [
            int(rI.total_iters), int(rI.n_fun_evals),
            int(rH.total_iters), int(rH.n_fun_evals),
        ]
    print(
        f"TOT iters I={tot[0]} H={tot[2]} ({100 * (tot[2] - tot[0]) / max(tot[0], 1):+.0f}%)  "
        f"evals I={tot[1]} H={tot[3]} ({100 * (tot[3] - tot[1]) / max(tot[1], 1):+.0f}%)"
    )

    # paired wall-clock over the chain (one sync per pass)
    for tag, use_warm in (("identity", False), ("warm", True)):
        ts_samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            xx = base_res[0].x
            hh = base_h[0] if use_warm else eye
            for k in range(1, N_WINDOWS):
                r, h = solve_lvl0(xx, hh, staged[k], wstats[k])
                xx = r.x
                hh = h if use_warm else eye
            float(r.fun_val)
            ts_samples.append((time.perf_counter() - t0) / (N_WINDOWS - 1))
        print(f"lvl0 chain {tag}: p50 {np.median(ts_samples) * 1e3:.1f} ms/window")


if __name__ == "__main__":
    main()
