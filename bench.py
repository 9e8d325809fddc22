"""Driver benchmark: solve latency + warp+splat throughput on the real TPU.

Prints TWO JSON lines, one metric each; the driver parses the LAST line:
    {"metric": "window_solve_p50", ...}          (informational)
    {"metric": "warp_splat_throughput", ...}     (headline, parsed)

Baselines (BASELINE.md): >= 50 Mevents/s/chip warp + IWE accumulate;
<= 100 ms p50 per-window solve at MVSEC scale.

Measurement notes for this environment (see .claude memory: axon-tpu-timing):
`jax.block_until_ready` does not block through the axon relay — the benchmark
reduces to a scalar on device and forces a host readback to synchronize, and
amortizes over many iterations so the ~30 ms relay round-trip vanishes.
"""

import json
import os
import sys
import time

# kernel compiles through the relayed backend are slow (minutes for the
# banded-candidate cond tree); cache them across runs, repo-local so the
# cache survives for whoever runs the bench next
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np


def measure_solve_latency():
    """Per-window pyramid solve at MVSEC scale on the shipped default.

    Workload, tuning, and honesty rationale live in
    `eincm_tpu.utils.benchmarks.build_mvsec_solve_bench` (shared with the
    paired A/B script): 6 distinct windows whose GT velocity rotates 15°
    per window, chained through the handover prior like a sequential
    sequence solve, one sync per 5-window round. p50 over rounds.
    """
    from eincm_tpu.utils.benchmarks import build_mvsec_solve_bench, solve_diag_str

    one_round, res = build_mvsec_solve_bench()
    print(f"# solve diag: {solve_diag_str(res)}", file=sys.stderr)
    samples = [one_round() for _ in range(5)]
    return float(np.median(samples) * 1e3)


def main():
    from eincm_tpu.ops.splat import set_splat_impl, splat_multi_ref
    from eincm_tpu.ops.warp import warp_events_multi_ref_coarse

    solve_ms = measure_solve_latency()
    print(
        json.dumps(
            {
                "metric": "window_solve_p50",
                "value": round(solve_ms, 1),
                "unit": "ms",
                # target is <= 100 ms (BASELINE.md): >1 means faster than it
                "vs_baseline": round(100.0 / solve_ms, 2),
            }
        ),
        flush=True,
    )

    # DSEC-scale workload: 480x640 sensor, 1.5M events, 2 reference times
    # (run.sh:99-121 des_n_events=1500000). This is the solver's hot path:
    # coarse theta -> fused bilinear interp + warp -> banded MXU splat per
    # reference. Events arrive tile-sorted (the DSEC-scale staging mode),
    # so the row+column-banded kernel engages; it degrades gracefully to the
    # row-banded and full-height kernels when banding is invalid.
    set_splat_impl("pallas_banded2d")
    H, W = 480, 640
    n_events = 1_500_000
    n_refs = 2

    rng = np.random.default_rng(0)
    from eincm_tpu.data.staging import tile_sort_events

    xs0 = rng.integers(0, W, n_events).astype(np.float32)
    ys0 = rng.integers(0, H, n_events).astype(np.float32)
    ts0 = rng.uniform(0, 1, n_events).astype(np.float32)
    xs_t, ys_t, ts_t, _ = tile_sort_events(
        xs0, ys0, ts0, np.zeros(n_events, bool), H
    )
    xs = jnp.asarray(xs_t)
    ys = jnp.asarray(ys_t)
    ts = jnp.asarray(ts_t)
    t_refs = jnp.asarray(np.linspace(0, 1, n_refs).astype(np.float32))
    theta = jnp.asarray(rng.normal(0, 4, (16, 16, 2)).astype(np.float32))

    @jax.jit
    def warp_splat(theta, seed):
        wx, wy = warp_events_multi_ref_coarse(
            theta, xs, ys, ts, t_refs, (H, W)
        )
        wx = wx + seed * 1e-6  # defeat caching across iterations
        frames = splat_multi_ref(wx, wy, (H, W))
        return frames.sum()

    # compile + first sync
    float(warp_splat(theta, jnp.float32(0.0)))

    # best-of-3 rounds: the relayed backend's throughput varies run to run;
    # the minimum round time reflects the machine's actual capability
    iters = 10
    best_dt = float("inf")
    for _round in range(3):
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for i in range(iters):
            acc = acc + warp_splat(theta, jnp.float32(i))
        _ = float(acc)  # single sync per round
        best_dt = min(best_dt, (time.perf_counter() - t0) / iters)

    events_per_sec = n_events * n_refs / best_dt
    mev = events_per_sec / 1e6
    baseline_mev = 50.0
    print(
        json.dumps(
            {
                "metric": "warp_splat_throughput",
                "value": round(mev, 1),
                "unit": "Mevents/s/chip",
                "vs_baseline": round(mev / baseline_mev, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
