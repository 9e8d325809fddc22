"""Stacked multi-ref splat default decision study (VERDICT r4 item 4).

The round-4 A/B measured +8.8% warp+splat throughput for the stacked
single-grid formulation but a directionally-worse 10-window AEE
(0.0593 -> 0.0680 px) with 2/10 armijo rescues vs 0/10 — one chain is too
little data to ship it or delete it. This study runs >= 5 independent
MVSEC-scale sequences x 10 windows per arm (loop vs stacked) through the
REAL experiment manager (rescue active), recording per-window AEE deltas,
rescue attempt/apply rates, and wall time.

Decision rule (PARITY.md): ship stacked as the default if the mean AEE
delta across sequences is within the harness chaos band (±0.01 px) AND the
rescue-attempt rate is not consistently higher; otherwise demote to the
bench harness and close the TODO.

Run (real TPU):  python scripts/multiref_stacked_study.py
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

from eincm_tpu.experiments.manager import EINCMExperiment
from scripts.armijo_rescue_validation import make_cfg

# 5 sequences: different directions, speeds, and feature layouts (seed)
SEQUENCES = [
    ("s0", (4.0, -3.0), 0),
    ("s1", (-3.5, 3.5), 1),
    ("s2", (5.5, 1.0), 2),
    ("s3", (1.5, -5.0), 3),
    ("s4", (-4.5, -2.0), 4),
]


def run_arm(seq_tag, velocity, seed, stacked, out_root):
    cfg = make_cfg(
        f"mrs_{seq_tag}_{'stacked' if stacked else 'loop'}",
        "armijo",
        True,
        out_root,
    )
    cfg.dataset.velocity = velocity
    cfg.dataset.seed = seed
    cfg.solver.splat_multiref_stacked = stacked
    exp = EINCMExperiment(cfg)
    t0 = time.perf_counter()
    exp.run_solver()
    solve_s = time.perf_counter() - t0
    exp.run_eval()
    aees = [
        float(
            np.asarray(exp.eval_results[f"datasample_idx_{i}"]["evals"]["AEE"])
        )
        for i in range(10)
    ]
    return aees, exp.n_rescue_attempts, exp.n_rescued, solve_s


def main():
    out_root = "/tmp/eincm_mrs_study"
    res = {}
    daee_means = []
    for seq_tag, vel, seed in SEQUENCES:
        per_seq = {}
        for stacked in (False, True):
            arm = "stacked" if stacked else "loop"
            aees, n_att, n_app, solve_s = run_arm(
                seq_tag, vel, seed, stacked, out_root
            )
            per_seq[arm] = aees
            res[f"{seq_tag}_aee_{arm}"] = [round(a, 4) for a in aees]
            res[f"{seq_tag}_aee_mean_{arm}"] = round(float(np.mean(aees)), 4)
            res[f"{seq_tag}_rescues_{arm}"] = [n_att, n_app]
            res[f"{seq_tag}_solve_s_{arm}"] = round(solve_s, 1)
            print(
                f"# {seq_tag} {arm}: mean {res[f'{seq_tag}_aee_mean_{arm}']} "
                f"rescues {n_att}/{n_app} solve {solve_s:.0f}s",
                file=sys.stderr, flush=True,
            )
        d = np.asarray(per_seq["stacked"]) - np.asarray(per_seq["loop"])
        res[f"{seq_tag}_daee_mean"] = round(float(d.mean()), 4)
        res[f"{seq_tag}_daee_worst"] = round(float(np.max(np.abs(d))), 4)
        daee_means.append(float(d.mean()))
    res["daee_mean_over_sequences"] = round(float(np.mean(daee_means)), 4)
    res["daee_mean_per_sequence"] = [round(d, 4) for d in daee_means]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
