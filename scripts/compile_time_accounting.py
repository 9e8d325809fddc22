"""Solver compile-time accounting through the axon relay (VERDICT r3 item 9).

CLAUDE.md says "first TPU compile of the solver is minutes" — this script
measures exactly how many, in fresh subprocesses so jit caches cannot leak:

  cold   empty persistent-cache dir: full trace + XLA compile + relay
  warm   repo .jax_cache populated: trace + cache deserialization only

Child mode stages ONE MVSEC-scale window, builds the shipped solver, and
times (a) make_window_solver + first solve (is_first variant) and (b) the
second variant's first solve (handover path), with scalar-readback syncs.

Run (real TPU):  python scripts/compile_time_accounting.py
Results recorded in docs/ARCHITECTURE.md.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child():
    import numpy as np  # noqa: F401

    from eincm_tpu.models.loss import LossParams
    from eincm_tpu.models.pyramid import (
        HandoverSettings,
        SolverConfig,
        make_window_solver,
    )
    from eincm_tpu.ops.splat import set_splat_impl
    from eincm_tpu.utils.benchmarks import MVSEC_H, MVSEC_W, stage_mvsec_windows

    set_splat_impl("pallas_banded")
    staged, _ = stage_mvsec_windows(2)
    cfg = SolverConfig(
        n_pyr_lvls=5,
        sensor_size=(MVSEC_H, MVSEC_W),
        params=LossParams(alpha=20.0, beta=35.0, gamma=0.0, delta=0.0),
        theta_opt_maxiters=(40, 33, 25, 18, 10),
        theta_gtol=1e-4,
        n_extra_attempts={0: 1, 1: 1},
        handover=HandoverSettings(
            use_handover=True, solve_handover_for_levels=(0,)
        ),
    )
    t0 = time.perf_counter()
    solver = make_window_solver(cfg)
    res0 = solver(staged[0], cfg.zero_pyramid(), is_first=True)
    float(res0.final_theta_pyr[0].sum())
    t_first = time.perf_counter() - t0

    t0 = time.perf_counter()
    res1 = solver(staged[1], res0.final_theta_pyr, is_first=False)
    float(res1.final_theta_pyr[0].sum())
    t_handover = time.perf_counter() - t0

    # steady state for reference
    t0 = time.perf_counter()
    res2 = solver(staged[1], res0.final_theta_pyr, is_first=False)
    float(res2.final_theta_pyr[0].sum())
    t_steady = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "first_variant_s": round(t_first, 1),
                "handover_variant_s": round(t_handover, 1),
                "steady_solve_s": round(t_steady, 3),
            }
        )
    )


def run_child(cache_dir):
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = cache_dir
    res = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child"],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    if res.returncode != 0:
        print(res.stderr[-3000:], file=sys.stderr)
        raise SystemExit("child failed")
    return json.loads(res.stdout.strip().splitlines()[-1])


def main():
    if "--child" in sys.argv:
        child()
        return
    out = {}
    with tempfile.TemporaryDirectory() as cold_dir:
        print("# cold (empty persistent cache)...", file=sys.stderr, flush=True)
        out["cold"] = run_child(cold_dir)
        print(f"# cold: {out['cold']}", file=sys.stderr, flush=True)
        print("# warm-same-dir (cache written by the cold run)...",
              file=sys.stderr, flush=True)
        out["warm"] = run_child(cold_dir)
        print(f"# warm: {out['warm']}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
