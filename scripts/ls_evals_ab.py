"""Paired A/B: max_ls_evals 10 (shipped) vs 6 — cheaper line-search failure?

Per-level accounting on the bench workload (scripts/mvsec_loss_breakdown.py
docstring) shows every pyramid level terminates on line-search exhaustion at
the f32 noise floor, and each such termination burns `max_ls_evals` value
probes finding no improving step — ~100 of the ~185 probes per window are
failure detection, ~25 ms of the ~90 ms p50. Accepted steps land within the
first 1-2 probes (~1 probe/iter excluding the failure bursts), so a smaller
cap should only shorten the failure bursts — IF accuracy holds: a cap of 6
can no longer find accepted steps smaller than alpha1/2^5, so the chain AEE
must be re-validated, exactly like the round-2 10-vs-25 measurement that set
the current default.

Protocol (real TPU):
  1. accuracy: the armijo_rescue_validation harness (10-window MVSEC-scale
     synthetic chain, Canny+IEDT edges, rescue on) at cap 10 vs 6 — AEE per
     window, rescue counts, solve wall time.
  2. latency: build_mvsec_solve_bench paired p50, interleaved rounds.

Run:  python scripts/ls_evals_ab.py

MEASURED (round 3, real TPU, this script):

    accuracy (10-window chain)  cap=10: AEE/window mean 0.0708, max 0.0989,
                                        rescues 1 attempted / 0 applied
                                cap=6:  AEE/window mean 0.0593, max 0.0832,
                                        rescues 0 / 0
                                per-window delta: mean −0.0116 px,
                                worst degradation +0.0087 px
    latency (bench workload)    cap=10: p50 88.0 ms    cap=6: p50 79.2 ms
    probe counts (diag window)  cap=10: 180 probes / 55 iters
                                cap=6:  114 probes / 53 iters

Verdict: accuracy is neutral-to-better (deltas are iterate-level chaos, the
worst per-window degradation is 0.009 px ≈ noise; fewer anomaly signals,
not more), probes −37%, p50 −10% — consistent with the failure-burst
accounting. cap=6 SHIPPED as the default (SolverSettings /
SolverConfig.max_ls_evals); the armijo rescue's wolfe re-solve pins its
own budget to >= 10, and wolfe parity studies keep 10-25.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache")
)

import numpy as np


def run_accuracy(cap: int, out_root: str):
    from eincm_tpu.experiments.manager import EINCMExperiment
    from scripts.armijo_rescue_validation import make_cfg

    cfg = make_cfg(f"lscap_{cap}", "armijo", True, out_root)
    cfg.solver.max_ls_evals = cap
    exp = EINCMExperiment(cfg)
    t0 = time.perf_counter()
    exp.run_solver()
    solve_s = time.perf_counter() - t0
    exp.run_eval()
    aees = [
        float(np.asarray(exp.eval_results[f"datasample_idx_{i}"]["evals"]["AEE"]))
        for i in range(10)
    ]
    return aees, (exp.n_rescue_attempts, exp.n_rescued), solve_s


def main():
    caps = (10, 6)
    res = {}

    for cap in caps:
        aees, (n_att, n_app), solve_s = run_accuracy(cap, "/tmp/eincm_lscap_ab")
        res[f"aee_{cap}"] = [round(a, 4) for a in aees]
        res[f"aee_mean_{cap}"] = round(float(np.mean(aees)), 4)
        res[f"aee_worst_{cap}"] = round(float(np.max(aees)), 4)
        res[f"rescues_{cap}"] = [n_att, n_app]
        res[f"solve_s_{cap}"] = round(solve_s, 2)

    # paired latency on the shared bench workload, interleaved rounds
    from eincm_tpu.utils.benchmarks import build_mvsec_solve_bench, solve_diag_str

    rounds = {}
    for cap in caps:
        one_round, diag_res = build_mvsec_solve_bench(
            solver_overrides={"max_ls_evals": cap}
        )
        rounds[cap] = one_round
        print(f"# cap={cap} diag: {solve_diag_str(diag_res)}", file=sys.stderr)
    samples = {cap: [] for cap in caps}
    for _ in range(5):
        for cap in caps:
            samples[cap].append(rounds[cap]())
    for cap in caps:
        res[f"p50_ms_{cap}"] = round(float(np.median(samples[cap])) * 1e3, 1)

    d = np.asarray(res[f"aee_{caps[1]}"]) - np.asarray(res[f"aee_{caps[0]}"])
    res["daee_mean"] = round(float(d.mean()), 4)
    res["daee_worst"] = round(float(d.max()), 4)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
