"""DSEC-scale timing: interp kernel fwd / fwd+bwd + chained window solves.

Refreshes the PARITY.md interp-kernel and s/window figures. (The fused-
normalization kernel variant this script once A/B'd was measured a no-win
— fwd 3.05 vs 3.08 ms, bwd slightly worse — and removed; see the NOTE in
ops/interp_pallas.py and git history for the variant itself.)

Run on the real TPU:  python scripts/dsec_solve_timing.py
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

from eincm_tpu.ops.interp_pallas import interp_theta_at_events_pallas

H, W = 480, 640
E = 1_500_000


def interp_kernel_timing():
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.uniform(-20, W + 19, E).astype(np.float32))
    ys = jnp.asarray(rng.uniform(-20, H + 19, E).astype(np.float32))
    theta = jnp.asarray(rng.normal(0, 4, (16, 16, 2)).astype(np.float32))
    cot = jnp.asarray(rng.normal(0, 1, (E, 2)).astype(np.float32))

    fwd = jax.jit(
        lambda t, s: interp_theta_at_events_pallas(
            t, xs + s * 1e-6, ys, (H, W)
        ).sum()
    )
    vg = jax.jit(
        jax.value_and_grad(
            lambda t, s: jnp.vdot(
                interp_theta_at_events_pallas(t, xs + s * 1e-6, ys, (H, W)),
                cot,
            )
        )
    )
    float(fwd(theta, jnp.float32(0.0)))
    v, _ = vg(theta, jnp.float32(0.0))
    float(v)

    def best_of(fn, rounds=5, iters=20):
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            acc = jnp.float32(0.0)
            for i in range(iters):
                acc = acc + fn(jnp.float32(i))
            float(acc)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best * 1e3

    f_ms = best_of(lambda s: fwd(theta, s))
    vg_ms = best_of(lambda s: (lambda out: out[0] + out[1].sum())(vg(theta, s)))
    print(f"interp kernel: fwd {f_ms:.2f} ms   fwd+bwd {vg_ms:.2f} ms")


def dsec_solve_timing():
    """3-window DSEC-scale chained solve, production tuning, per-window s."""
    from eincm_tpu.data.staging import stage_datasample
    from eincm_tpu.data.synthetic import SyntheticDataLoader
    from eincm_tpu.experiments.config import EdgeConfig
    from eincm_tpu.models.loss import LossParams
    from eincm_tpu.models.pyramid import (
        HandoverSettings,
        SolverConfig,
        make_window_solver,
    )
    from eincm_tpu.ops.splat import set_splat_impl

    set_splat_impl("pallas_banded2d")
    n_ev = 1_500_000
    dl = SyntheticDataLoader(
        sensor_size=(H, W), n_windows=4, des_n_events=n_ev,
        velocity=(6.0, -4.0), n_features=700, seed=3,
    )
    dl.get_ready()
    edge_fn = EdgeConfig(
        enable_image_preprocessing=False, smoothen_method="eincm_iedt"
    ).make_edge_fn()
    staged = [
        stage_datasample(
            dl[i], edge_fn=edge_fn, preprocess=False, pad_to=n_ev,
            sort_by_tile=True,
        ).window
        for i in range(4)
    ]
    cfg = SolverConfig(
        n_pyr_lvls=5,
        sensor_size=(H, W),
        params=LossParams(alpha=2000.0, beta=4000.0, gamma=0.0, delta=0.0),
        theta_opt_maxiters=(40, 33, 25, 18, 10),
        theta_gtol=1e-4,
        n_extra_attempts={0: 1, 1: 1},
        handover=HandoverSettings(
            use_handover=True, solve_handover_for_levels=(0,)
        ),
    )
    solver = make_window_solver(cfg)
    res = solver(staged[0], cfg.zero_pyramid(), is_first=True)
    float(res.final_theta_pyr[0].sum())
    times = []
    for k in (1, 2, 3):
        t0 = time.perf_counter()
        res = solver(staged[k], res.final_theta_pyr, is_first=False)
        float(res.final_theta_pyr[0].sum())
        times.append(time.perf_counter() - t0)
    print("dsec_window_solve_s: " + ", ".join(f"{t:.2f}" for t in times))


if __name__ == "__main__":
    interp_kernel_timing()
    print("# DSEC-scale chained window solves (production tuning)...",
          file=sys.stderr)
    dsec_solve_timing()
