"""Scan-over-levels solver A/B: compile time + trajectory equivalence.

VERDICT r4 item 2: the per-level build costs 20-30 min of cold compile per
DSEC solver variant; the scan build (models/pyramid_scan.py) traces ONE
level body. This script measures, in fresh subprocesses (jit caches cannot
leak), the cold compile of BOTH builds at a chosen scale, and the 10-window
chained-solve AEE agreement between them.

  python scripts/scan_solver_ab.py --scale mvsec   (~15 min on the TPU)
  python scripts/scan_solver_ab.py --scale dsec    (the headline: per-level
                                                    is 20-30 min alone)

Child mode output: one JSON line with compile + solve timings and the
10-window AEE list.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(scale: str, impl: str):
    import numpy as np

    from eincm_tpu.models.loss import LossParams
    from eincm_tpu.models.pyramid import (
        HandoverSettings,
        SolverConfig,
        make_window_solver,
    )
    from eincm_tpu.models.pyramid_scan import make_window_solver_scan
    from eincm_tpu.ops.resize import scale_theta_to_sensor_size
    from eincm_tpu.ops.splat import set_splat_impl

    if scale == "mvsec":
        from eincm_tpu.utils.benchmarks import (
            MVSEC_H as H, MVSEC_W as W, stage_mvsec_windows,
        )

        set_splat_impl("pallas_banded")
        staged, vels = stage_mvsec_windows(10, rotate_deg=15.0)
        params = LossParams(alpha=20.0, beta=35.0, gamma=0.0, delta=0.0)
    else:
        from eincm_tpu.data.staging import stage_datasample
        from eincm_tpu.data.synthetic import SyntheticDataLoader
        from eincm_tpu.experiments.config import EdgeConfig
        from eincm_tpu.utils.benchmarks import (
            DSEC_H as H, DSEC_N_EVENTS, DSEC_W as W,
        )

        set_splat_impl("pallas_banded2d")
        edge_fn = EdgeConfig(
            enable_image_preprocessing=False, smoothen_method="eincm_iedt"
        ).make_edge_fn()
        speed = 7.2
        phi0 = np.arctan2(-4.0, 6.0)
        staged, vels = [], []
        n_win = 10
        for k in range(n_win):
            phi = phi0 + np.deg2rad(15.0) * k
            vel = (speed * np.cos(phi), speed * np.sin(phi))
            dl = SyntheticDataLoader(
                sensor_size=(H, W), n_windows=1,
                des_n_events=DSEC_N_EVENTS, velocity=vel,
                n_features=700, seed=3 + k,
            )
            dl.get_ready()
            staged.append(
                stage_datasample(
                    dl[0], edge_fn=edge_fn, preprocess=False,
                    pad_to=DSEC_N_EVENTS, sort_by_tile=True,
                ).window
            )
            vels.append(vel)
        params = LossParams(alpha=2000.0, beta=4000.0, gamma=0.0, delta=0.0)

    cfg = SolverConfig(
        n_pyr_lvls=5,
        sensor_size=(H, W),
        params=params,
        theta_opt_maxiters=(40, 33, 25, 18, 10),
        theta_gtol=1e-4,
        n_extra_attempts={0: 1, 1: 1},
        handover=HandoverSettings(
            use_handover=True, solve_handover_for_levels=(0,)
        ),
    )
    build = make_window_solver_scan if impl == "scan" else make_window_solver

    t0 = time.perf_counter()
    solver = build(cfg)
    res = solver(staged[0], cfg.zero_pyramid(), is_first=True)
    float(res.final_theta_pyr[0].sum())
    t_first = time.perf_counter() - t0

    t0 = time.perf_counter()
    prior = res.final_theta_pyr
    res1 = solver(staged[1], prior, is_first=False)
    float(res1.final_theta_pyr[0].sum())
    t_handover = time.perf_counter() - t0

    # chained 10-window solve, per-window AEE against the exact GT velocity
    aees = []
    t0 = time.perf_counter()
    results = [res, res1]
    prior = res1.final_theta_pyr
    for k in range(2, len(staged)):
        r = solver(staged[k], prior, is_first=False)
        prior = r.final_theta_pyr
        results.append(r)
    float(prior[0].sum())
    t_chain = time.perf_counter() - t0
    for k, r in enumerate(results):
        full = np.asarray(
            scale_theta_to_sensor_size(r.final_theta_pyr[0], (H, W))
        )
        v = np.asarray(vels[k])
        aees.append(
            float(np.linalg.norm(full - v[None, None, :], axis=-1).mean())
        )
    print(
        json.dumps(
            {
                "impl": impl,
                "first_variant_s": round(t_first, 1),
                "handover_variant_s": round(t_handover, 1),
                "chain_8_windows_s": round(t_chain, 2),
                "aee_per_window": [round(a, 4) for a in aees],
                "aee_mean": round(float(np.mean(aees)), 4),
            }
        )
    )


def run_child(scale, impl, cache_dir):
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = cache_dir
    res = subprocess.run(
        [
            sys.executable, os.path.abspath(__file__),
            "--child", "--scale", scale, "--impl", impl,
        ],
        capture_output=True, text=True, env=env, timeout=5400,
    )
    if res.returncode != 0:
        print(res.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"child {impl} failed")
    return json.loads(res.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=("mvsec", "dsec"), default="mvsec")
    ap.add_argument("--impl", choices=("perlevel", "scan"), default=None)
    ap.add_argument("--child", action="store_true")
    ap.add_argument(
        "--skip-perlevel", action="store_true",
        help="only measure the scan build (the per-level DSEC number is "
        "already recorded in docs/ARCHITECTURE.md)",
    )
    args = ap.parse_args()
    if args.child:
        child(args.scale, args.impl)
        return
    out = {"scale": args.scale}
    impls = ["scan"] if args.skip_perlevel else ["scan", "perlevel"]
    for impl in impls:
        with tempfile.TemporaryDirectory() as cold_dir:
            print(f"# cold-compiling {impl}...", file=sys.stderr, flush=True)
            out[impl] = run_child(args.scale, impl, cold_dir)
            print(f"# {impl}: {out[impl]}", file=sys.stderr, flush=True)
    if len(impls) == 2:
        deltas = [
            abs(a - b)
            for a, b in zip(
                out["scan"]["aee_per_window"],
                out["perlevel"]["aee_per_window"],
            )
        ]
        out["aee_max_delta"] = round(max(deltas), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
