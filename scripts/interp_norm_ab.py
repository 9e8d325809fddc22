"""Paired A/B of the interp kernel's fused vs per-axis normalization,
plus a DSEC-scale full-window solve timing (refreshes the PARITY.md
2.30 s/window figure with the interp kernel in the path).

Run on the real TPU:  python scripts/interp_norm_ab.py
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

import eincm_tpu.ops.interp_pallas as mod
from eincm_tpu.ops.interp_pallas import interp_theta_at_events_pallas

H, W = 480, 640
E = 1_500_000


def build(fused):
    mod._FUSED_NORM = fused
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
    v, g = vg(theta, jnp.float32(0.0))
    float(v)

    def run_fwd():
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for i in range(20):
            acc = acc + fwd(theta, jnp.float32(i))
        float(acc)
        return (time.perf_counter() - t0) / 20

    def run_vg():
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for i in range(20):
            v, g = vg(theta, jnp.float32(i))
            acc = acc + v + g.sum()
        float(acc)
        return (time.perf_counter() - t0) / 20

    return run_fwd, run_vg, (theta, cot, fwd, vg)


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
    return times


def main():
    benches = {f: build(f) for f in (False, True)}
    rows = {f: {"fwd": [], "vg": []} for f in (False, True)}
    for _ in range(5):
        for f in (False, True):
            run_fwd, run_vg, _ = benches[f]
            rows[f]["fwd"].append(run_fwd())
            rows[f]["vg"].append(run_vg())
    for f in (False, True):
        name = "fused" if f else "plain"
        fw = min(rows[f]["fwd"]) * 1e3
        vg = min(rows[f]["vg"]) * 1e3
        print(f"interp[{name}]: fwd {fw:.2f} ms   fwd+bwd {vg:.2f} ms  "
              "(rounds fwd: "
              + ", ".join(f"{x*1e3:.2f}" for x in rows[f]["fwd"]) + ")")

    # numerics: both flags must agree to f32 association tolerance
    tA = benches[False][2]
    tB = benches[True][2]
    vA, gA = tA[3](tA[0], jnp.float32(0.0))
    vB, gB = tB[3](tB[0], jnp.float32(0.0))
    print(f"fused-vs-plain value relerr: "
          f"{abs(float(vA) - float(vB)) / abs(float(vA)):.2e}  "
          f"grad maxrel: "
          f"{float(jnp.max(jnp.abs(gA - gB)) / jnp.max(jnp.abs(gA))):.2e}")

    print("# DSEC-scale chained window solves (production tuning)...",
          file=sys.stderr)
    times = dsec_solve_timing()
    print("dsec_window_solve_s: "
          + ", ".join(f"{t:.2f}" for t in times))


if __name__ == "__main__":
    main()
