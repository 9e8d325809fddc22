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
    """Chained DSEC-scale solves, production tuning — ONE shared workload
    with bench.py's dsec_window_solve_p50 (utils/benchmarks.py)."""
    from eincm_tpu.utils.benchmarks import build_dsec_solve_bench, solve_diag_str

    one_round, res = build_dsec_solve_bench()
    print(f"# dsec solve diag: {solve_diag_str(res)}", file=sys.stderr)
    times = [one_round() for _ in range(3)]
    print("dsec_window_solve_s: " + ", ".join(f"{t:.2f}" for t in times))


if __name__ == "__main__":
    interp_kernel_timing()
    print("# DSEC-scale chained window solves (production tuning)...",
          file=sys.stderr)
    dsec_solve_timing()
