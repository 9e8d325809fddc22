"""Serial vs sharded EVAL phase on the 8-device virtual CPU mesh.

VERDICT r3 item 5 measurement: run_eval (serial per-window loop) vs
run_eval_parallel (chunks of n_dev * windows_per_device, one sharded
dispatch per chunk) over the same solved synthetic sequence. On the
virtual CPU mesh the per-device lanes are threads of one host, so the
wall-clock ratio understates real multi-chip gains (devices share
cores — on this container ONE core); the dispatch-count reduction
(n_windows serial dispatches -> n_chunks sharded dispatches) is the
structural win that carries to real meshes, where eval at DSEC-extended
scale (thousands of windows) stops being the post-solve bottleneck.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python scripts/parallel_eval_bench.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )


def main():
    import jax

    # the host sitecustomize force-registers the TPU and resets
    # jax_platforms — the env var alone is not enough (see tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) == 8, jax.devices()

    import numpy as np

    from eincm_tpu.experiments.config import ExperimentConfig
    from eincm_tpu.experiments.manager import EINCMExperiment

    cfg = ExperimentConfig()
    cfg.dataset.kind = "synthetic"
    cfg.dataset.sensor_size = (64, 64)
    cfg.dataset.des_n_events = 4096
    cfg.dataset.n_windows = 16
    cfg.dataset.velocity = (2.0, -1.0)
    cfg.solver.n_pyr_lvls = 3
    cfg.solver.theta_maxiter = 6
    cfg.solver.theta_miniter = 3
    cfg.alpha, cfg.beta = 60.0, 0.0
    cfg.edge.enable_image_preprocessing = False
    cfg.output_dir = "/tmp/eincm_parallel_eval_bench"
    cfg.phases.plot = False

    exp = EINCMExperiment(cfg)
    exp.run_solver()

    res = {}
    for mode in ("serial", "parallel", "serial2", "parallel2"):
        par = mode.startswith("parallel")
        exp.cfg.phases.parallel_eval = par
        exp.eval_results = {}
        t0 = time.perf_counter()
        exp.run_eval()
        res[f"eval_s_{mode}"] = round(time.perf_counter() - t0, 2)
        if mode == "serial":
            baseline = {
                k: float(np.asarray(v["evals"]["AEE"]))
                for k, v in exp.eval_results.items()
            }
    # equivalence spot check on the last parallel pass
    for k, aee in baseline.items():
        assert abs(
            float(np.asarray(exp.eval_results[k]["evals"]["AEE"])) - aee
        ) < 1e-5
    # second pass of each mode excludes compile cost
    res["speedup_warm"] = round(
        res["eval_s_serial2"] / res["eval_s_parallel2"], 2
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
