"""Paired A/B: noise-floor (ftol) termination vs reference retry semantics.

VERDICT r3 item 3. The round-3 latency accounting (TODO.md): every pyramid
level terminates on line-search exhaustion at the f32 noise floor (status
2), burning max_ls_evals value probes proving no step improves, and the
reference-parity extra-attempt retry then re-runs levels 0/1 — roughly a
third of solve time is spent *detecting* the floor. `theta_ftol` (
SolverConfig/bfgs.minimize_bfgs) instead declares the floor after
ftol_patience consecutive below-floor relative improvements (an exhausted
search with the floor already indicated completes the patience), with
status 4 never retried.

Protocol (real TPU):
  1. accuracy: the armijo_rescue_validation 10-window MVSEC-scale chain
     (Canny+IEDT edges, rescue on) at ftol in {None, 1e-6, 1e-5} — AEE per
     window, rescue counts, wall time.
  2. latency: paired interleaved p50 on the shared MVSEC bench workload
     and the DSEC-scale chained-solve workload.

Run:  python scripts/ftol_ab.py
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

FTOLS = (None, 1e-6, 1e-5)


def tag(ftol):
    return "none" if ftol is None else f"{ftol:.0e}"


def run_accuracy(ftol, out_root):
    from eincm_tpu.experiments.manager import EINCMExperiment
    from scripts.armijo_rescue_validation import make_cfg

    cfg = make_cfg(f"ftol_{tag(ftol)}", "armijo", True, out_root)
    cfg.solver.theta_ftol = ftol
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
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-accuracy", action="store_true")
    ap.add_argument("--skip-dsec", action="store_true")
    args = ap.parse_args()

    res = {}
    for ftol in (() if args.skip_accuracy else FTOLS):
        aees, (n_att, n_app), solve_s = run_accuracy(ftol, "/tmp/eincm_ftol_ab")
        t = tag(ftol)
        res[f"aee_{t}"] = [round(a, 4) for a in aees]
        res[f"aee_mean_{t}"] = round(float(np.mean(aees)), 4)
        res[f"aee_worst_{t}"] = round(float(np.max(aees)), 4)
        res[f"rescues_{t}"] = [n_att, n_app]
        res[f"solve_s_{t}"] = round(solve_s, 2)
        print(f"# accuracy ftol={t}: mean {res[f'aee_mean_{t}']}", file=sys.stderr)

    # paired MVSEC-scale latency, interleaved rounds
    from eincm_tpu.utils.benchmarks import (
        build_dsec_solve_bench,
        build_mvsec_solve_bench,
        solve_diag_str,
    )

    rounds = {}
    for ftol in FTOLS:
        one_round, diag = build_mvsec_solve_bench(
            solver_overrides={"theta_ftol": ftol}
        )
        rounds[ftol] = one_round
        print(f"# mvsec ftol={tag(ftol)} diag: {solve_diag_str(diag)}",
              file=sys.stderr)
    samples = {f: [] for f in FTOLS}
    for _ in range(5):
        for f in FTOLS:
            samples[f].append(rounds[f]())
    for f in FTOLS:
        res[f"mvsec_p50_ms_{tag(f)}"] = round(
            float(np.median(samples[f])) * 1e3, 1
        )
    print("# mvsec p50: " + json.dumps(
        {k: v for k, v in res.items() if k.startswith("mvsec_p50")}),
        file=sys.stderr, flush=True)
    if args.skip_dsec:
        print(json.dumps(res))
        return

    # paired DSEC-scale latency (None vs the best candidate), fewer rounds
    dsec_rounds = {}
    for ftol in (None, 1e-6):
        one_round, diag = build_dsec_solve_bench(
            solver_overrides={"theta_ftol": ftol}
        )
        dsec_rounds[ftol] = one_round
        print(f"# dsec ftol={tag(ftol)} diag: {solve_diag_str(diag)}",
              file=sys.stderr)
    dsec_samples = {f: [] for f in dsec_rounds}
    for _ in range(2):
        for f in dsec_rounds:
            dsec_samples[f].append(dsec_rounds[f]())
    for f in dsec_rounds:
        res[f"dsec_p50_ms_{tag(f)}"] = round(
            float(np.median(dsec_samples[f])) * 1e3, 0
        )
    print("# dsec p50: " + json.dumps(
        {k: v for k, v in res.items() if k.startswith("dsec_p50")}),
        file=sys.stderr, flush=True)

    if "aee_none" in res:
        for f in FTOLS[1:]:
            d = np.asarray(res[f"aee_{tag(f)}"]) - np.asarray(res["aee_none"])
            res[f"daee_mean_{tag(f)}"] = round(float(d.mean()), 4)
            res[f"daee_worst_{tag(f)}"] = round(float(d.max()), 4)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
