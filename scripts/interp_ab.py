"""Paired A/B: solver latency + warp+splat throughput, pallas vs xla interp.

The axon relay's throughput varies run to run; this interleaves the two
implementations in ONE session so the comparison is paired.

Run on the real TPU:  python scripts/interp_ab.py
"""

import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def solve_latency(impl):
    # one shared definition of the MVSEC-scale workload (see its docstring
    # for the rotated-velocity honesty rationale) — the interp impl is
    # pinned before the solver traces
    from eincm_tpu.utils.benchmarks import build_mvsec_solve_bench

    return build_mvsec_solve_bench(interp_impl=impl)


def throughput_fn(impl):
    # one shared definition of the DSEC-scale warp+splat workload with
    # bench.py's headline metric — the interp impl is pinned before tracing
    from eincm_tpu.utils.benchmarks import build_dsec_throughput_bench

    return build_dsec_throughput_bench(interp_impl=impl)


def main():
    # Build solve benches for both impls first (compiles), then interleave.
    from eincm_tpu.ops.warp import set_interp_impl

    print("# building solve benches (compiles)...", file=sys.stderr)
    solve = {}
    for impl in ("xla", "pallas"):
        solve[impl], _ = solve_latency(impl)
    rounds = {"xla": [], "pallas": []}
    for r in range(6):
        for impl in ("xla", "pallas"):
            set_interp_impl(impl)  # no-op post-trace, but keep honest
            rounds[impl].append(solve[impl]())
    for impl in ("xla", "pallas"):
        ms = np.median(rounds[impl]) * 1e3
        print(f"solve_p50[{impl}] = {ms:.1f} ms  (rounds: "
              + ", ".join(f"{x*1e3:.1f}" for x in rounds[impl]) + ")")

    print("# building throughput benches (compiles)...", file=sys.stderr)
    thr = {impl: throughput_fn(impl) for impl in ("xla", "pallas")}
    tput = {"xla": [], "pallas": []}
    for r in range(4):
        for impl in ("xla", "pallas"):
            tput[impl].append(thr[impl]())
    from eincm_tpu.utils.benchmarks import DSEC_N_EVENTS, DSEC_N_REFS

    for impl in ("xla", "pallas"):
        best = min(tput[impl])
        mev = DSEC_N_EVENTS * DSEC_N_REFS / best / 1e6
        print(f"warp_splat[{impl}] best {best*1e3:.2f} ms/iter = {mev:.0f} Mev/s"
              "  (rounds: "
              + ", ".join(f"{x*1e3:.2f}" for x in tput[impl]) + ")")


if __name__ == "__main__":
    main()
