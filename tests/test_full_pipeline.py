"""Full-pipeline integration: real CLI over on-disk dataset trees.

The only seam not covered elsewhere: loader -> manager -> tools over an
actual directory tree, driven through the actual CLI entry point
(`python -m eincm_tpu.experiments` semantics via main(argv)), matching the
reference's operational flow (src/experiments/e00/exp_mgr.py:535-611 and
src/dsec_npz_to_png.py:84-101). One test per dataset kind; every artifact is
asserted: opt/eval npz schema, scores.txt, end-result plots, the AVI video,
and (DSEC) the benchmark-submission PNGs.
"""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

pytestmark = pytest.mark.slow  # each CLI run solves+evals+plots a sequence

from eincm_tpu.experiments.__main__ import main  # noqa: E402
from eincm_tpu.experiments.outputs import EINCMOutputLoader  # noqa: E402


def run_cli(out_dir, name, overrides):
    argv = [
        f"output_dir={out_dir}",
        f"experiment_name={name}",
        "phases.solve=true",
        "phases.eval=true",
        "phases.plot=true",
        "solver.n_pyr_lvls=3",
        "solver.theta_maxiter=3",
        "solver.theta_miniter=2",
        "solver.handover_maxiter=4",
        "solver.max_ls_evals=4",
        "edge.enable_image_preprocessing=false",
        "alpha=60",
        "beta=10",
    ] + overrides
    return main(argv)


def assert_artifacts(exp_dir, n_windows, has_gt=True):
    opt_path = exp_dir / "opt_results.npz"
    eval_path = exp_dir / "eval_results.npz"
    assert opt_path.is_file() and eval_path.is_file()
    loader = EINCMOutputLoader()
    opt = loader.load_opt_results(str(opt_path))  # validates the schema
    assert len(opt) == n_windows
    evals = loader.load_eval_results(str(eval_path))
    assert len(evals) == n_windows
    for rec in evals.values():
        assert "evals" in rec and "loss" in rec["evals"]

    scores = (exp_dir / "scores.txt").read_text()
    assert "loss:" in scores and "fwl:" in scores
    assert ("AEE" in scores) == has_gt  # flow errors only with ground truth

    plots = exp_dir / "plots"
    pngs = list(plots.glob("**/*.png"))
    assert pngs, "no plot PNGs written"
    avis = list(plots.glob("**/*.avi"))
    assert avis, "no AVI assembled"
    return opt


def test_ecd_full_pipeline(tmp_path):
    from dataset_fixtures import make_ecd_tree

    root, seq = make_ecd_tree(tmp_path / "ecd")
    exp = run_cli(
        tmp_path / "out", "ecd_e2e",
        [
            "dataset.kind=ecd",
            f"dataset.root_dir={root}",
            f"dataset.sequence_name={seq}",
            "dataset.des_n_events=1000",
            "dataset.sensor_size=[176,240]",
        ],
    )
    assert_artifacts(tmp_path / "out" / "ecd_e2e", n_windows=5, has_gt=False)
    # ECD has no GT flow: no flow-error metrics in the evals dict
    for rec in exp.eval_results.values():
        assert "AEE" not in rec["evals"]


def test_mvsec_full_pipeline(tmp_path):
    from dataset_fixtures import make_mvsec_tree

    root = make_mvsec_tree(tmp_path / "mvsec")
    exp = run_cli(
        tmp_path / "out", "mvsec_e2e",
        [
            "dataset.kind=mvsec",
            f"dataset.root_dir={root}",
            "dataset.sequence_name=outdoor_day2",
            "dataset.des_n_events=2000",
            "dataset.delta_idx=4",
            "dataset.sensor_size=[256,336]",
            "phases.run_idx_range=[0,3]",
        ],
    )
    assert_artifacts(tmp_path / "out" / "mvsec_e2e", n_windows=3)
    # GT exists: flow-error metrics present and finite
    for rec in exp.eval_results.values():
        assert np.isfinite(float(np.asarray(rec["evals"]["AEE"])))


def test_dsec_quarter_scale_cli_kill_resume(tmp_path):
    """Production-adjacent CLI regression net (VERDICT r4 item 6): a
    quarter-DSEC run (240x320, 150k events, 3 windows) through the REAL
    `python -m eincm_tpu.experiments` — SOLVE in a subprocess SIGKILLed
    after its first checkpoint, resume via phases.run_from_checkpoint, then
    an EVAL/PLOT-only invocation (the round-4 auto-load bug class), then
    the submission export. Reference flow: exp_mgr.py:535-659."""
    import os
    import subprocess
    import sys
    import time

    from dataset_fixtures import make_dsec_tree

    root, seq = make_dsec_tree(
        tmp_path / "dsec", sensor=(240, 320), n_ev=150_000, n_eval_windows=3
    )
    out = tmp_path / "out"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    common = [
        f"output_dir={out}",
        "experiment_name=dsec_q",
        "dataset.kind=dsec",
        f"dataset.root_dir={root}",
        f"dataset.sequence_name={seq}",
        "dataset.data_split=train",
        "dataset.des_n_events=49152",
        "dataset.sensor_size=[240,320]",
        "solver.n_pyr_lvls=5",
        "solver.theta_maxiter=8",
        "solver.theta_miniter=4",
        "solver.handover_maxiter=5",
        "solver.max_ls_evals=4",
        "edge.enable_image_preprocessing=false",
        "alpha=2000",
        "beta=4000",
        "phases.checkpoint_every_percent=30",
        "phases.delete_checkpoints_at_end=false",
    ]
    solve_args = common + [
        "phases.solve=true", "phases.eval=false", "phases.plot=false",
    ]

    # ---- phase 1: real module CLI, killed after the first checkpoint -----
    proc = subprocess.Popen(
        [sys.executable, "-m", "eincm_tpu.experiments"] + solve_args,
        cwd=repo,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    ckpt_dir = out / "dsec_q" / "checkpoints"
    deadline = time.time() + 1500
    ckpt = None
    try:
        while time.time() < deadline:
            if proc.poll() is not None:
                break
            cks = sorted(ckpt_dir.glob("checkpoint_*.npz"))
            if cks:
                try:  # the file may still be mid-write; only a loadable
                    # checkpoint counts as "landed"
                    with np.load(cks[-1], allow_pickle=True) as z:
                        z["opt_results"].item()
                    ckpt = cks[-1]
                    break
                except Exception:
                    pass
            time.sleep(2)
    finally:
        if proc.poll() is None:
            proc.kill()  # the abrupt death the resume path exists for
            proc.wait()
    if ckpt is None:
        # the run may have finished (fast machine) with checkpoints kept
        cks = sorted(ckpt_dir.glob("checkpoint_*.npz"))
        assert cks, "no checkpoint landed before the deadline"
        ckpt = cks[-1]

    # ---- phase 2: resume from the checkpoint through the same CLI --------
    exp = main(solve_args + [f"phases.run_from_checkpoint={ckpt}"])
    assert len(exp.opt_results) == 3

    # ---- phase 3: EVAL/PLOT-only invocation (auto-loads opt_results) -----
    exp2 = main(
        common
        + ["phases.solve=false", "phases.eval=true", "phases.plot=true"]
    )
    assert len(exp2.eval_results) == 3
    exp_dir = out / "dsec_q"
    opt = assert_artifacts(exp_dir, n_windows=3)
    # handover diagnostic emitted for the non-first windows
    assert list((exp_dir / "plots").glob("handover_*_pyr0.png"))
    for rec in exp2.eval_results.values():
        assert np.isfinite(float(np.asarray(rec["evals"]["AEE"])))

    # ---- phase 4: submission export over the resumed results -------------
    from eincm_tpu.tools.dsec_submission import main as sub_main
    from eincm_tpu.utils.png16 import read_png16

    csv = tmp_path / f"{seq}.csv"
    csv.write_text(
        "# from, to, file_idx\n"
        "1000000,1100000,10\n1100000,1200000,20\n1200000,1300000,30\n"
    )
    sub_dir = tmp_path / "submission"
    sub_main(
        [
            "--sequence_name", seq,
            "--opt_results_path", str(exp_dir / "opt_results.npz"),
            "--eval_ts_path", str(csv),
            "--output_dir", str(sub_dir),
        ]
    )
    pngs = sorted((sub_dir / seq).glob("*.png"))
    assert [p.name for p in pngs] == [
        "000010.png", "000020.png", "000030.png",
    ]
    enc = read_png16(pngs[0])
    assert enc.shape == (480, 640, 3) and enc.dtype == np.uint16
    assert opt  # schema validated in assert_artifacts


def test_dsec_full_pipeline_and_submission(tmp_path):
    from dataset_fixtures import make_dsec_tree

    root, seq = make_dsec_tree(tmp_path / "dsec")
    run_cli(
        tmp_path / "out", "dsec_e2e",
        [
            "dataset.kind=dsec",
            f"dataset.root_dir={root}",
            f"dataset.sequence_name={seq}",
            "dataset.data_split=train",
            "dataset.des_n_events=5000",
            "dataset.sensor_size=[480,640]",
        ],
    )
    exp_dir = tmp_path / "out" / "dsec_e2e"
    opt = assert_artifacts(exp_dir, n_windows=2)

    # ---- submission export over the real opt_results.npz ----------------
    from eincm_tpu.tools.dsec_submission import main as sub_main
    from eincm_tpu.utils.png16 import read_png16

    # DSEC test-split eval csv layout: from_ts, to_ts, file_idx
    csv = tmp_path / f"{seq}.csv"
    csv.write_text(
        "# from, to, file_idx\n1000000,1100000,10\n1100000,1200000,20\n"
    )
    sub_dir = tmp_path / "submission"
    sub_main(
        [
            "--sequence_name", seq,
            "--opt_results_path", str(exp_dir / "opt_results.npz"),
            "--eval_ts_path", str(csv),
            "--output_dir", str(sub_dir),
        ]
    )
    pngs = sorted((sub_dir / seq).glob("*.png"))
    assert [p.name for p in pngs] == ["000010.png", "000020.png"]
    enc = read_png16(pngs[0])
    assert enc.shape == (480, 640, 3) and enc.dtype == np.uint16
    assert (enc[..., 2] == 1).all()
    # decode back: uint16 = flow*128 + 2^15 must reproduce the solved theta
    theta = opt["datasample_idx_0"]["solver_final_results"][
        "final_theta_pyr"
    ]["pyr_lvl_0"]
    from eincm_tpu.tools.dsec_submission import theta_to_submission_png

    np.testing.assert_array_equal(enc, theta_to_submission_png(theta))
