"""Paired A/B: per-ref-loop vs single-grid STACKED multi-ref splat.

VERDICT r3 item 8 / TODO.md multi-ref bullet: the per-ref loop pays the
banded kernel's dispatch + pipeline warmup/drain once per reference frame
(2-ref fwd 5.6 ms vs 2x single-ref 6.8 ms at DSEC scale); the stacked
formulation (ops/splat._splat_multi_ref_stacked) pays it once by stacking
refs into a virtual (R*H + guard, W) sensor.

Protocol (real TPU):
  0. numeric parity of the two formulations at DSEC scale (fwd + vjp);
  1. DSEC-scale warp+splat throughput (the driver's headline workload);
  2. MVSEC-scale chained solve p50 (the production 2-ref case).

Run:  python scripts/multiref_stacked_ab.py
Ship or close per the results (PARITY.md / TODO.md).
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache")
)

import numpy as np


def parity_check():
    import jax
    import jax.numpy as jnp

    from eincm_tpu.data.staging import tile_sort_events
    from eincm_tpu.ops.splat import _splat_multi_ref_stacked
    from eincm_tpu.ops.splat_banded import events_to_pdf_frame_pallas_banded

    H, W, E, R = 480, 640, 1_500_000, 2
    rng = np.random.default_rng(0)
    xs0 = rng.integers(0, W, E).astype(np.float32)
    ys0 = rng.integers(0, H, E).astype(np.float32)
    ts0 = rng.uniform(0, 1, E).astype(np.float32)
    xs_t, ys_t, _, _ = tile_sort_events(xs0, ys0, ts0, np.zeros(E, bool), H)
    ep = len(xs_t)  # tile_sort pads to tile-chunk multiples (NaN tails)
    wxs = jnp.stack(
        [
            jnp.asarray(xs_t) + rng.uniform(-4, 4, ep).astype(np.float32)
            for _ in range(R)
        ]
    )
    wys = jnp.stack(
        [
            jnp.asarray(ys_t) + rng.uniform(-4, 4, ep).astype(np.float32)
            for _ in range(R)
        ]
    )
    cot = jnp.asarray(rng.normal(0, 1, (R, H, W)).astype(np.float32))

    def loop_fn(a, b):
        return jnp.stack(
            [
                events_to_pdf_frame_pallas_banded(
                    a[i], b[i], (H, W), 3, try_col_band=True
                )
                for i in range(R)
            ]
        )

    def stacked_fn(a, b):
        return _splat_multi_ref_stacked(a, b, (H, W), 3, try_col_band=True)

    f_loop = jax.jit(lambda a, b: (loop_fn(a, b) * cot).sum())
    f_stacked = jax.jit(lambda a, b: (stacked_fn(a, b) * cot).sum())
    v_l = float(f_loop(wxs, wys))
    v_s = float(f_stacked(wxs, wys))
    g_l = jax.jit(jax.grad(lambda a, b: (loop_fn(a, b) * cot).sum(), (0, 1)))(
        wxs, wys
    )
    g_s = jax.jit(
        jax.grad(lambda a, b: (stacked_fn(a, b) * cot).sum(), (0, 1))
    )(wxs, wys)
    # grad_maxrel is dominated by the documented sub-ULP .5-boundary snap
    # (ops/splat.py): a handful of events' windows shift one row, giving
    # isolated large per-coordinate deltas. Report how many coordinates
    # exceed 1% of the global grad magnitude so reruns can see the affected
    # POPULATION, not just the worst coordinate.
    gmax, n_big, n_total = 0.0, 0, 0
    for gs, gl in zip(g_s, g_l):
        scale = float(jnp.maximum(jnp.max(jnp.abs(gl)), 1e-30))
        d = jnp.abs(gs - gl) / scale
        gmax = max(gmax, float(jnp.max(d)))
        n_big += int(jnp.sum(d > 0.01))
        n_total += int(d.size)
    return {
        "value_relerr": abs(v_s - v_l) / max(abs(v_l), 1e-30),
        "grad_maxrel": gmax,
        "grad_coords_over_1pct": n_big,
        "grad_coords_total": n_total,
    }


def main():
    from eincm_tpu.ops.splat import set_splat_multiref_stacked
    from eincm_tpu.utils.benchmarks import (
        DSEC_N_EVENTS,
        DSEC_N_REFS,
        build_dsec_throughput_bench,
        build_mvsec_solve_bench,
        solve_diag_str,
    )

    res = {"parity": parity_check()}
    print(f"# parity: {res['parity']}", file=sys.stderr, flush=True)

    # throughput (the builders trace at build time -> set the flag first)
    tp_rounds = {}
    for mode in ("loop", "stacked"):
        set_splat_multiref_stacked(mode == "stacked")
        tp_rounds[mode] = build_dsec_throughput_bench()
    samples = {m: [] for m in tp_rounds}
    for _ in range(5):
        for m in tp_rounds:
            samples[m].append(tp_rounds[m]())
    for m, s in samples.items():
        res[f"throughput_mev_{m}"] = round(
            DSEC_N_EVENTS * DSEC_N_REFS / min(s) / 1e6, 1
        )
    print(
        f"# throughput: loop {res['throughput_mev_loop']} vs stacked "
        f"{res['throughput_mev_stacked']} Mev/s",
        file=sys.stderr, flush=True,
    )

    # MVSEC solve p50
    solve_rounds = {}
    for mode in ("loop", "stacked"):
        set_splat_multiref_stacked(mode == "stacked")
        one_round, diag = build_mvsec_solve_bench()
        solve_rounds[mode] = one_round
        print(f"# {mode} diag: {solve_diag_str(diag)}", file=sys.stderr)
    s2 = {m: [] for m in solve_rounds}
    for _ in range(5):
        for m in solve_rounds:
            s2[m].append(solve_rounds[m]())
    for m, s in s2.items():
        res[f"solve_p50_ms_{m}"] = round(float(np.median(s)) * 1e3, 1)

    set_splat_multiref_stacked(False)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
