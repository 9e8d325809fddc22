"""Optimizer-trajectory parity vs the reference at PRODUCTION shape.

VERDICT r3 item 2: the round-3 trajectory parity was proven at toy scale
only (64x64, 8192 events); this drives the same harness
(tests/reference_solver_parity_check.py) at the MVSEC production shape —
256x336 sensor, 30k events/window, growing maxiters 40..10 — for BOTH
tunings (ECD-style a60 b60 and MVSEC-outdoor a20 b35 g0.0025, which
engages the TV term through the whole trajectory).

The reference side is scipy f64 BFGS on CPU driving the reference's own
loss; expect hours of wall clock. Results are recorded in PARITY.md and
asserted CI-side by tests/test_reference_parity.py::
TestProductionTrajectoryParity (opt-in: EINCM_PRODUCTION_PARITY=1).

Run:  python scripts/production_parity.py [--windows N]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HARNESS = os.path.join(REPO, "tests", "reference_solver_parity_check.py")

PRODUCTION_ENV = {
    "EINCM_PARITY_H": "256",
    "EINCM_PARITY_W": "336",
    "EINCM_PARITY_EVENTS": "30000",
    "EINCM_PARITY_MAXITERS": "40,33,25,18,10",
    "EINCM_PARITY_FEATURES": "180",
    "EINCM_PARITY_VX": "4.0",
    "EINCM_PARITY_VY": "-3.0",
}

TUNINGS = {
    "a60b60": {"EINCM_PARITY_ALPHA": "60", "EINCM_PARITY_BETA": "60",
               "EINCM_PARITY_GAMMA": "0"},
    "a20b35g0.0025": {"EINCM_PARITY_ALPHA": "20", "EINCM_PARITY_BETA": "35",
                      "EINCM_PARITY_GAMMA": "0.0025"},
}


STATE_DIR = os.path.join(REPO, ".parity_ckpt")


def run_one(name, tuning_env, n_windows):
    """One tuning, checkpointed: each solved reference-side window persists
    under .parity_ckpt/<name>/ (the ref side costs ~45 min/window at
    production shape on this container's single CPU core), XLA compiles
    land in a persistent cache, and stderr (incl. per-window partial
    metrics) streams to .parity_ckpt/<name>.log."""
    env = dict(os.environ)
    env.update(PRODUCTION_ENV)
    env.update(tuning_env)
    env["EINCM_PARITY_WINDOWS"] = str(n_windows)
    env["JAX_PLATFORMS"] = "cpu"
    env["EINCM_PARITY_CKPT"] = os.path.join(STATE_DIR, name)
    env["EINCM_PARITY_CACHE"] = os.path.join(STATE_DIR, "xla_cache")
    # single-device: the forced virtual mesh changes XLA compilation enough
    # to nudge individual windows into different basins (see the CI fixture)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    os.makedirs(STATE_DIR, exist_ok=True)
    log_path = os.path.join(STATE_DIR, f"{name}.log")
    print(f"# running {name} ({n_windows} windows), log: {log_path}",
          file=sys.stderr, flush=True)
    with open(log_path, "a") as log, open(
        os.path.join(STATE_DIR, f"{name}.stdout"), "a+"
    ) as out_f:
        res = subprocess.run(
            [sys.executable, HARNESS], stdout=out_f, stderr=log, env=env
        )
        out_f.seek(0)
        stdout = out_f.read()
    if res.returncode != 0:
        print(f"{name} failed (rc {res.returncode}); see {log_path}",
              file=sys.stderr)
        raise SystemExit(f"{name} failed")
    out = json.loads(stdout.strip().splitlines()[-1])
    print(f"# {name}: {json.dumps(out)}", file=sys.stderr, flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=10)
    ap.add_argument("--tuning", choices=sorted(TUNINGS), default=None,
                    help="run a single tuning (default: both, sequentially)")
    args = ap.parse_args()
    names = [args.tuning] if args.tuning else list(TUNINGS)
    results = {}
    for name in names:
        results[name] = run_one(name, TUNINGS[name], args.windows)
        with open(os.path.join(STATE_DIR, "results.json"), "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
