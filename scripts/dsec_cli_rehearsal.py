"""Production-shape CLI rehearsal on the real TPU (VERDICT r3 item 7).

One scripted end-to-end drive at the scale the toy CLI integration tests
cannot reach: a synthetic DSEC-scale sequence (480x640, 1.5M events/window,
6 windows, the full run.sh:99-121 tuning) through the real CLI

    python -m eincm_tpu.experiments  SOLVE -> EVAL -> PLOT

including a MID-RUN KILL of the solve (SIGKILL after the first checkpoint
appears) + resume-from-checkpoint, and the DSEC submission PNG export
(tools/dsec_submission.py equivalent of dsec_npz_to_png.py:84-101).
Artifacts are validated (outputs schema, scores.txt, plot files, 16-bit
submission PNG round-trip) and wall-clock numbers printed for PARITY.md.

Run:  python scripts/dsec_cli_rehearsal.py [--out DIR]
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_WINDOWS = 6
NAME = "dsec_rehearsal"

BASE_OVERRIDES = [
    "experiment_name=" + NAME,
    "dataset.kind=synthetic",
    "dataset.sensor_size=[480,640]",
    "dataset.des_n_events=1500000",
    f"dataset.n_windows={N_WINDOWS}",
    "dataset.velocity=[6.0,-4.0]",
    "alpha=2000", "beta=4000",
    "solver.n_pyr_lvls=5",
    "solver.theta_maxiter=40", "solver.theta_miniter=10",
    "solver.n_extra_attempts={0: 1, 1: 1}",
    "solver.splat_impl=pallas_banded2d",
    "edge.enable_image_preprocessing=false",
    "edge.smoothen_method=eincm_iedt",
    # checkpoint after every ~2 windows so the kill leaves one behind
    "phases.checkpoint_every_percent=34",
    "phases.delete_checkpoints_at_end=false",
    "compilation_cache_dir=" + os.path.join(REPO, ".jax_cache"),
]


def run_cli(overrides, timeout=None, kill_after_checkpoint=False,
            ckpt_dir=None):
    cmd = [sys.executable, "-m", "eincm_tpu.experiments"] + overrides
    t0 = time.perf_counter()
    if not kill_after_checkpoint:
        subprocess.run(cmd, check=True, timeout=timeout, cwd=REPO)
        return time.perf_counter() - t0, None
    # run detached; SIGKILL once the first checkpoint file lands + margin
    proc = subprocess.Popen(cmd, cwd=REPO)
    ckpt = None
    deadline = time.time() + (timeout or 3600)
    while time.time() < deadline:
        cks = sorted(Path(ckpt_dir).glob("checkpoint_*.npz"))
        if cks:
            ckpt = cks[-1]
            time.sleep(5)  # let the write finish; then kill mid-sequence
            break
        if proc.poll() is not None:
            raise SystemExit("solve finished before any checkpoint appeared")
        time.sleep(5)
    assert ckpt is not None, "no checkpoint before deadline"
    proc.send_signal(signal.SIGKILL)
    proc.wait()
    return time.perf_counter() - t0, ckpt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/eincm_dsec_rehearsal")
    args = ap.parse_args()
    out_root = Path(args.out)
    out_dir = out_root / NAME
    ckpt_dir = out_dir / "checkpoints"
    overrides = BASE_OVERRIDES + [f"output_dir={out_root}"]
    timings = {}

    # ---- phase 1: SOLVE, killed mid-run after the first checkpoint -------
    t, ckpt = run_cli(
        overrides + ["phases.solve=true", "phases.eval=false",
                     "phases.plot=false"],
        kill_after_checkpoint=True, ckpt_dir=ckpt_dir,
    )
    timings["solve_until_kill_s"] = round(t, 1)
    print(f"# killed solve after {t:.0f}s at checkpoint {ckpt.name}",
          file=sys.stderr, flush=True)

    # ---- phase 2: resume from the checkpoint, finish SOLVE ---------------
    t, _ = run_cli(
        overrides + ["phases.solve=true", "phases.eval=false",
                     "phases.plot=false",
                     f"phases.run_from_checkpoint={ckpt}"],
    )
    timings["resume_solve_s"] = round(t, 1)

    # ---- phase 3: EVAL + PLOT from the saved opt_results -----------------
    t, _ = run_cli(
        overrides + ["phases.solve=false", "phases.eval=true",
                     "phases.plot=true"],
    )
    timings["eval_plot_s"] = round(t, 1)

    # ---- validate artifacts ---------------------------------------------
    import numpy as np

    from eincm_tpu.experiments.outputs import (
        EINCMOutputLoader,
        validate_eval_results,
        validate_opt_results,
    )

    loader = EINCMOutputLoader()
    opt = loader.load_opt_results(out_dir / "opt_results.npz")
    validate_opt_results(opt, 5)
    assert len(opt) == N_WINDOWS, len(opt)
    ev = loader.load_eval_results(out_dir / "eval_results.npz")
    validate_eval_results(ev)
    scores = (out_dir / "scores.txt").read_text()
    assert "AEE" in scores
    aees = [
        float(np.asarray(ev[f"datasample_idx_{i}"]["evals"]["AEE"]))
        for i in range(N_WINDOWS)
    ]
    timings["aee_mean"] = round(float(np.mean(aees)), 4)
    plots = list((out_dir / "plots").glob("**/*.png"))
    assert plots, "no plot artifacts"

    # ---- phase 4: DSEC submission export ---------------------------------
    from eincm_tpu.tools.dsec_submission import export_submission
    from eincm_tpu.utils.png16 import read_png16

    csv = out_root / "seq.csv"
    with open(csv, "w") as f:
        f.write("# from_timestamp_us, to_timestamp_us, file_index\n")
        for i in range(N_WINDOWS):
            f.write(f"{i * 100000},{(i + 1) * 100000},{10 * (i + 1)}\n")
    t0 = time.perf_counter()
    written = export_submission(
        out_dir / "opt_results.npz", csv, out_root / "submission"
    )
    timings["submission_export_s"] = round(time.perf_counter() - t0, 1)
    assert len(written) == N_WINDOWS
    img = read_png16(written[0])
    assert img.shape == (480, 640, 3) and img.dtype == np.uint16
    flow = (img[..., :2].astype(np.float64) - 2**15) / 128
    assert np.all(np.abs(flow) < 100)

    timings["n_checkpoint_resumed_windows"] = len(opt)
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
