"""theta_ftol default decision study (VERDICT r4 item 3).

Protocol: >= 3 independent DSEC-scale chained sequences with DIFFERENT GT
regimes — constant velocity, rotating direction (15 deg/window), and a
shear field (vx varying linearly with y; spatially non-constant GT the
16x16 theta pyramid must actually track) — each solved as an 8-window
handover chain on the real TPU at the full production tuning, with
theta_ftol in {None, 1e-5} over the SAME staged windows. If the per-window
full-field AEE deltas stay within the established band, 1e-5 ships as the
default (the measured -13% DSEC p50 win, PARITY.md round-4 ftol section).

Solver build: scan-over-levels (models/pyramid_scan.py) for BOTH arms —
bit-exact with the per-level build on the TPU
(tests/test_tpu_kernels.py::test_scan_solver_equivalence_on_tpu), so its
evidence transfers, and its one-traced-level-body compile makes 2 arms x 2
variants affordable (the per-level build costs 20-30 min cold EACH at DSEC
scale).

Run (real TPU):  python scripts/ftol_dsec_study.py [--windows 8]
"""

import argparse
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


def stage_regime(regime: str, n_windows: int):
    """Stage n_windows DSEC-scale windows + exact GT flow fields."""
    from eincm_tpu.data.staging import stage_datasample
    from eincm_tpu.data.synthetic import SyntheticDataLoader
    from eincm_tpu.experiments.config import EdgeConfig
    from eincm_tpu.utils.benchmarks import DSEC_H, DSEC_N_EVENTS, DSEC_W

    edge_fn = EdgeConfig(
        enable_image_preprocessing=False, smoothen_method="eincm_iedt"
    ).make_edge_fn()

    def stage(dl, idx):
        return stage_datasample(
            dl[idx], edge_fn=edge_fn, preprocess=False,
            pad_to=DSEC_N_EVENTS, sort_by_tile=True,
        )

    windows, gts = [], []
    if regime == "rotating":
        speed, phi0 = 7.2, np.arctan2(-4.0, 6.0)
        for k in range(n_windows):
            phi = phi0 + np.deg2rad(15.0) * k
            dl = SyntheticDataLoader(
                sensor_size=(DSEC_H, DSEC_W), n_windows=1,
                des_n_events=DSEC_N_EVENTS,
                velocity=(speed * np.cos(phi), speed * np.sin(phi)),
                n_features=700, seed=3 + k,
            )
            dl.get_ready()
            windows.append(stage(dl, 0).window)
            gts.append(dl.gt_flow_field())
    else:
        kw = dict(
            sensor_size=(DSEC_H, DSEC_W), n_windows=n_windows,
            des_n_events=DSEC_N_EVENTS, n_features=700, seed=11,
        )
        if regime == "constant":
            dl = SyntheticDataLoader(velocity=(6.0, -4.0), **kw)
        elif regime == "shear":
            dl = SyntheticDataLoader(
                velocity=(2.0, 0.0), shear=0.02, **kw
            )
        else:
            raise ValueError(regime)
        dl.get_ready()
        for k in range(n_windows):
            windows.append(stage(dl, k).window)
            gts.append(dl.gt_flow_field())
    return windows, gts


def solve_chain(solver, cfg, windows):
    t0 = time.perf_counter()
    prior = cfg.zero_pyramid()
    results = []
    for k, w in enumerate(windows):
        r = solver(w, prior, is_first=(k == 0))
        prior = r.final_theta_pyr
        results.append(r)
    float(prior[0].sum())  # relay sync
    return results, time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=8)
    ap.add_argument(
        "--regimes", default="constant,rotating,shear",
        help="comma-separated subset",
    )
    args = ap.parse_args()

    from eincm_tpu.models.loss import LossParams
    from eincm_tpu.models.pyramid import HandoverSettings, SolverConfig
    from eincm_tpu.models.pyramid_scan import make_window_solver_scan
    from eincm_tpu.ops.resize import scale_theta_to_sensor_size
    from eincm_tpu.ops.splat import set_splat_impl
    from eincm_tpu.utils.benchmarks import DSEC_H, DSEC_W

    set_splat_impl("pallas_banded2d")

    def make_cfg(ftol):
        return SolverConfig(
            n_pyr_lvls=5,
            sensor_size=(DSEC_H, DSEC_W),
            params=LossParams(alpha=2000.0, beta=4000.0),
            theta_opt_maxiters=(40, 33, 25, 18, 10),
            theta_gtol=1e-4,
            n_extra_attempts={0: 1, 1: 1},
            handover=HandoverSettings(
                use_handover=True, solve_handover_for_levels=(0,)
            ),
            theta_ftol=ftol,
        )

    solvers = {
        tag: (make_window_solver_scan(make_cfg(ftol)), make_cfg(ftol))
        for tag, ftol in (("none", None), ("1e-5", 1e-5))
    }

    out = {}
    for regime in args.regimes.split(","):
        print(f"# staging {regime}...", file=sys.stderr, flush=True)
        windows, gts = stage_regime(regime, args.windows)
        for tag, (solver, cfg) in solvers.items():
            results, dt = solve_chain(solver, cfg, windows)
            aees = []
            for r, gt in zip(results, gts):
                full = np.asarray(
                    scale_theta_to_sensor_size(
                        r.final_theta_pyr[0], (DSEC_H, DSEC_W)
                    )
                )
                aees.append(
                    float(
                        np.linalg.norm(full - gt, axis=-1).mean()
                    )
                )
            statuses = [
                [int(s.status) for s in r.theta_opt_states] for r in results
            ]
            out[f"{regime}_aee_{tag}"] = [round(a, 4) for a in aees]
            out[f"{regime}_aee_mean_{tag}"] = round(float(np.mean(aees)), 4)
            out[f"{regime}_chain_s_{tag}"] = round(dt, 1)
            out[f"{regime}_status4_windows_{tag}"] = sum(
                1 for st in statuses if 4 in st
            )
            print(
                f"# {regime} ftol={tag}: mean AEE "
                f"{out[f'{regime}_aee_mean_{tag}']} chain {dt:.0f}s",
                file=sys.stderr, flush=True,
            )
        da = np.asarray(out[f"{regime}_aee_1e-5"]) - np.asarray(
            out[f"{regime}_aee_none"]
        )
        out[f"{regime}_daee_mean"] = round(float(da.mean()), 4)
        out[f"{regime}_daee_worst"] = round(float(np.max(np.abs(da))), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
