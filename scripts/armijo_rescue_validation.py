"""Armijo tail-safeguard validation (VERDICT r2 item 4 "done" criterion).

Round-2 PARITY.md validated armijo-vs-wolfe on means (±0.07 px) but the
worst window reached +0.243 px on the MVSEC tuning. This script re-runs the
validation at MVSEC scale on the real TPU with the round-3 rescue in place:

  wolfe            strong Wolfe everywhere (scipy-parity semantics)
  armijo           shipped default, rescue disabled
  armijo+rescue    shipped default (solver.armijo_rescue on)

10-window synthetic sequence (sequential handover chain, Canny+IEDT edges),
per-window AEE vs the exact GT. Prints one JSON line with per-window AEEs,
worst-window deltas vs wolfe, and the rescue count.
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

from eincm_tpu.experiments.config import ExperimentConfig
from eincm_tpu.experiments.manager import EINCMExperiment


def make_cfg(tag, line_search, rescue, out_root, interp=False):
    cfg = ExperimentConfig()
    cfg.experiment_name = tag
    cfg.output_dir = out_root
    cfg.dataset.kind = "synthetic"
    cfg.dataset.sensor_size = (256, 336)
    cfg.dataset.des_n_events = 30_000
    cfg.dataset.n_windows = 11  # last window is boundary-deficient; skip it
    cfg.dataset.velocity = (4.0, -3.0)
    cfg.alpha, cfg.beta = 20.0, 35.0
    cfg.edge.enable_image_preprocessing = False
    cfg.edge.smoothen_method = "eincm_iedt"
    cfg.solver.n_pyr_lvls = 5
    cfg.solver.theta_maxiter = 40
    cfg.solver.theta_miniter = 10
    cfg.solver.theta_gtol = 1e-4
    cfg.solver.n_extra_attempts = {0: 1, 1: 1}
    cfg.solver.line_search = line_search
    cfg.solver.armijo_rescue = rescue
    cfg.solver.armijo_interpolate = interp
    cfg.solver.splat_impl = "pallas_banded"
    from eincm_tpu.models.pyramid import HandoverSettings

    cfg.handover = HandoverSettings(
        use_handover=True, solve_handover_for_levels=(0,)
    )
    cfg.phases.run_idx_range = (0, 10)
    cfg.phases.eval = True
    cfg.phases.plot = False
    cfg.phases.checkpoint_every_percent = 0
    return cfg


def run(tag, line_search, rescue, out_root, interp=False):
    import time

    cfg = make_cfg(tag, line_search, rescue, out_root, interp)
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
    out_root = "/tmp/eincm_rescue_val"
    res = {}
    for tag, ls, rescue, interp in (
        ("wolfe", "wolfe", False, False),
        ("armijo", "armijo", False, False),
        ("armijo_rescue", "armijo", True, False),
        # quadratic-interpolated backtracking (AEE-neutrality check for the
        # prospective default flip — see scripts/armijo_interp_probe.py)
        ("armijo_interp", "armijo", True, True),
    ):
        aees, (n_attempts, n_applied), solve_s = run(
            tag, ls, rescue, out_root, interp
        )
        res[f"aee_{tag}"] = [round(a, 4) for a in aees]
        res[f"aee_mean_{tag}"] = round(float(np.mean(aees)), 4)
        res[f"n_rescue_attempts_{tag}"] = n_attempts
        res[f"n_rescued_{tag}"] = n_applied
        res[f"solve_s_{tag}"] = round(solve_s, 2)
    for tag in ("armijo", "armijo_rescue", "armijo_interp"):
        d = np.asarray(res[f"aee_{tag}"]) - np.asarray(res["aee_wolfe"])
        res[f"daee_mean_{tag}"] = round(float(d.mean()), 4)
        res[f"daee_worst_{tag}"] = round(float(d.max()), 4)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
