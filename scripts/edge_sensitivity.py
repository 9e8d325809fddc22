"""Edge-pipeline sensitivity study (VERDICT r3 item 6).

The reference's edge maps ARE OpenCV outputs (src/utils/img_utils.py:
152-206); ours are independent implementations that cannot be compared
against cv2 in this container. This study bounds the resulting accuracy
risk instead: perturb each edge-extraction knob by the magnitude an
OpenCV-vs-ours deviation could plausibly produce (Canny thresholds ±25%,
IEDT alpha ±25%, Gaussian smoothing sigma ±25%, plus preprocessing on/off)
and measure the AEE impact of each perturbation on an MVSEC-scale
synthetic sequence solved with the full shipped pipeline.

If AEE is flat across these perturbations, the bi-modal objective is
robust to edge-map differences of at least this magnitude — far larger
than any plausible cv2-vs-ours numeric deviation (our Canny/EDT are
algorithm-identical; deviations would be boundary-pixel-level).

Run (real TPU):  python scripts/edge_sensitivity.py
Results are recorded in PARITY.md.
"""

import dataclasses
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


def perturbed_edge_cfg(base, kind, seed=7):
    """Wrap a config's edge_fn with a STRUCTURAL perturbation of the binary
    edge map before smoothing — the honest model of a cv2-vs-ours Canny
    deviation (a few boundary pixels differing), which threshold sweeps
    cannot emulate on the high-contrast synthetic fixture:
      drop10   remove a random 10% of edge pixels
      add5     add spurious edge pixels (5% of the edge count)
      shift1   translate the whole edge map by 1 px (worst-case systematic
               localization bias, far beyond any NMS implementation delta)
    """
    import dataclasses as _dc

    from eincm_tpu.edge import pipeline as ep

    cfg = _dc.replace(base)
    inner_smoothen = (
        (lambda e: ep.eincm_inv_exp_dist_transform(e, cfg.iedt_alpha))
        if cfg.smoothen_method == "eincm_iedt"
        else (lambda e: ep.smoothen_edges(e, cfg.smoothen_k_size,
                                          cfg.smoothen_sigma))
    )
    rng = np.random.default_rng(seed)

    def perturb(edge):
        e = np.asarray(edge) > 0
        if kind == "drop10":
            mask = rng.uniform(size=e.shape) < 0.10
            e = e & ~mask
        elif kind == "add5":
            n_add = max(1, int(e.sum() * 0.05))
            ys = rng.integers(0, e.shape[0], n_add)
            xs = rng.integers(0, e.shape[1], n_add)
            e = e.copy()
            e[ys, xs] = True
        elif kind == "shift1":
            e = np.roll(e, (1, 1), axis=(0, 1))
        else:
            raise ValueError(kind)
        return e.astype(np.float64)

    EPSN = sys.float_info.epsilon

    def edge_fn(images):
        # the pipeline with the perturbation inserted between Canny and
        # smoothing (mirrors ep.extract_edges)
        out = []
        for img in images:
            if cfg.enable_image_preprocessing:
                img = ep.preprocess_image(img, **(cfg.preprocess_kwargs or {}))
            edges = ep.image_to_edge(
                img, cfg.canny_aperture, cfg.canny_th1, cfg.canny_th2
            )
            sm = np.asarray(inner_smoothen(perturb(edges)), np.float64)
            out.append((sm - sm.min()) / (sm.max() - sm.min() + EPSN))
        return np.stack(out)

    class _Cfg:
        def make_edge_fn(self):
            return edge_fn

    return _Cfg()


def solve_chain_aee(edge_cfg, n_windows=6):
    """Solve an MVSEC-scale rotating-velocity chain with the given edge
    pipeline; return per-window AEE at event pixels vs the exact GT."""
    import jax.numpy as jnp

    from eincm_tpu.models.loss import LossParams
    from eincm_tpu.models.pyramid import (
        HandoverSettings,
        SolverConfig,
        make_window_solver,
    )
    from eincm_tpu.ops.resize import scale_theta_to_sensor_size
    from eincm_tpu.ops.splat import set_splat_impl
    from eincm_tpu.utils.benchmarks import (
        MVSEC_H,
        MVSEC_W,
        stage_mvsec_windows,
    )

    set_splat_impl("pallas_banded")
    staged, vels = stage_mvsec_windows(n_windows, edge_cfg=edge_cfg)
    cfg = SolverConfig(
        n_pyr_lvls=5,
        sensor_size=(MVSEC_H, MVSEC_W),
        params=LossParams(alpha=20.0, beta=35.0, gamma=0.0, delta=0.0),
        theta_opt_maxiters=(40, 33, 25, 18, 10),
        theta_gtol=1e-4,
        n_extra_attempts={0: 1, 1: 1},
        handover=HandoverSettings(
            use_handover=True, solve_handover_for_levels=(0,)
        ),
    )
    solver = make_window_solver(cfg)
    prior = cfg.zero_pyramid()
    aees = []
    for k, (w, vel) in enumerate(zip(staged, vels)):
        res = solver(w, prior, is_first=(k == 0))
        prior = res.final_theta_pyr
        full = np.asarray(
            scale_theta_to_sensor_size(
                res.final_theta_pyr[0], (MVSEC_H, MVSEC_W), "bilinear"
            )
        )
        xs = np.asarray(w.xs)
        ys = np.asarray(w.ys)
        keep = np.isfinite(xs)
        ix = np.clip(xs[keep].astype(int), 0, MVSEC_W - 1)
        iy = np.clip(ys[keep].astype(int), 0, MVSEC_H - 1)
        err = np.linalg.norm(
            full[iy, ix] - np.asarray(vel)[None, :], axis=-1
        )
        aees.append(float(err.mean()))
    return aees


def main():
    from eincm_tpu.experiments.config import EdgeConfig

    base = EdgeConfig(
        enable_image_preprocessing=False, smoothen_method="eincm_iedt"
    )
    variants = {
        "baseline": base,
        # Canny thresholds +-25% (reference MVSEC-outdoor run.sh:84: 30/80)
        "canny_-25%": dataclasses.replace(
            base, canny_th1=22.5, canny_th2=60.0
        ),
        "canny_+25%": dataclasses.replace(
            base, canny_th1=37.5, canny_th2=100.0
        ),
        # IEDT alpha +-25% (reference default 6.0, img_utils.py:229-233)
        "iedt_alpha_-25%": dataclasses.replace(base, iedt_alpha=4.5),
        "iedt_alpha_+25%": dataclasses.replace(base, iedt_alpha=7.5),
        # gaussian smoothing instead of IEDT, sigma +-25% around 1.0
        "gauss_sigma_0.75": dataclasses.replace(
            base, smoothen_method="gaussian", smoothen_sigma=0.75
        ),
        "gauss_sigma_1.0": dataclasses.replace(
            base, smoothen_method="gaussian", smoothen_sigma=1.0
        ),
        "gauss_sigma_1.25": dataclasses.replace(
            base, smoothen_method="gaussian", smoothen_sigma=1.25
        ),
        # full preprocessing chain on (NL-means + CLAHE + sharpen +
        # bilateral — our C++/numpy implementations)
        "preprocess_on": dataclasses.replace(
            base, enable_image_preprocessing=True
        ),
        # STRUCTURAL edge perturbations — the honest model of a cv2-vs-ours
        # Canny deviation (the synthetic fixture's high-contrast edges make
        # threshold sweeps vacuous; differing boundary pixels are what an
        # implementation delta would actually look like)
        "edges_drop10%": perturbed_edge_cfg(base, "drop10"),
        "edges_add5%": perturbed_edge_cfg(base, "add5"),
        "edges_shift1px": perturbed_edge_cfg(base, "shift1"),
    }

    res = {}
    for name, cfg in variants.items():
        t0 = time.perf_counter()
        aees = solve_chain_aee(cfg)
        res[name] = {
            "aee_per_window": [round(a, 4) for a in aees],
            "aee_mean": round(float(np.mean(aees)), 4),
            "aee_worst": round(float(np.max(aees)), 4),
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        print(f"# {name}: mean {res[name]['aee_mean']} "
              f"worst {res[name]['aee_worst']}", file=sys.stderr, flush=True)

    base_mean = res["baseline"]["aee_mean"]
    for name in res:
        res[name]["daee_vs_baseline"] = round(
            res[name]["aee_mean"] - base_mean, 4
        )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
