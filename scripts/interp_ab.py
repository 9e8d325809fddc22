"""Paired A/B: solver latency + warp+splat throughput, pallas vs xla interp.

The axon relay's throughput varies run to run; this interleaves the two
implementations in ONE session so the comparison is paired.

Run on the real TPU:  python scripts/interp_ab.py
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


def solve_latency(impl):
    # one shared definition of the MVSEC-scale workload (see its docstring
    # for the rotated-velocity honesty rationale) — the interp impl is
    # pinned before the solver traces
    from eincm_tpu.utils.benchmarks import build_mvsec_solve_bench

    return build_mvsec_solve_bench(interp_impl=impl)


def throughput_fn(impl):
    from eincm_tpu.data.staging import tile_sort_events
    from eincm_tpu.ops.splat import set_splat_impl, splat_multi_ref
    from eincm_tpu.ops.warp import set_interp_impl, warp_events_multi_ref_coarse

    set_splat_impl("pallas_banded2d")
    set_interp_impl(impl)
    H, W = 480, 640
    n_events, n_refs = 1_500_000, 2
    rng = np.random.default_rng(0)
    xs0 = rng.integers(0, W, n_events).astype(np.float32)
    ys0 = rng.integers(0, H, n_events).astype(np.float32)
    ts0 = rng.uniform(0, 1, n_events).astype(np.float32)
    xs_t, ys_t, ts_t, _ = tile_sort_events(
        xs0, ys0, ts0, np.zeros(n_events, bool), H
    )
    xs, ys, ts = jnp.asarray(xs_t), jnp.asarray(ys_t), jnp.asarray(ts_t)
    t_refs = jnp.asarray(np.linspace(0, 1, n_refs).astype(np.float32))
    theta = jnp.asarray(rng.normal(0, 4, (16, 16, 2)).astype(np.float32))

    @jax.jit
    def warp_splat(theta, seed):
        wx, wy = warp_events_multi_ref_coarse(theta, xs, ys, ts, t_refs, (H, W))
        wx = wx + seed * 1e-6
        frames = splat_multi_ref(wx, wy, (H, W))
        return frames.sum()

    float(warp_splat(theta, jnp.float32(0.0)))

    def one_round():
        iters = 10
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for i in range(iters):
            acc = acc + warp_splat(theta, jnp.float32(i))
        float(acc)
        return (time.perf_counter() - t0) / iters

    return one_round


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
    for impl in ("xla", "pallas"):
        best = min(tput[impl])
        mev = 1_500_000 * 2 / best / 1e6
        print(f"warp_splat[{impl}] best {best*1e3:.2f} ms/iter = {mev:.0f} Mev/s"
              "  (rounds: "
              + ", ".join(f"{x*1e3:.2f}" for x in tput[impl]) + ")")


if __name__ == "__main__":
    main()
