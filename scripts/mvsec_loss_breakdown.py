"""MVSEC-scale loss-eval breakdown: where does the 1.5 ms value&grad go?

The DSEC-scale breakdown (TODO.md) showed the splat kernel dominating
(13.5 of 20.2 ms fwd+bwd). At MVSEC scale (256x336, 30k events, 2 refs)
the same evaluation reads ~1.5 ms for only 60k event-splats — ~39 Mev/s
against the kernels' 394 Mev/s DSEC-scale capability — so the eval must be
dominated by per-call fixed costs, not event throughput. This script
mirrors the DSEC breakdown at MVSEC scale to find which stage owns the
fixed cost (and therefore whether the solve p50 has headroom left):

  - full solver_loss value&grad and value-only (the BFGS iteration costs)
  - warp (coarse-grid interp + displacement) fwd / fwd+bwd
  - splat fwd / fwd+bwd, row-banded vs full-height kernel
  - post-splat loss chain (normalize, MSE corr, Scharr contrast, combine)

Run on the real TPU:  python scripts/mvsec_loss_breakdown.py

MEASURED (round 3, real TPU, amortized over 200 in-dispatch evaluations):

    solver_loss          value-only 0.250 ms   value&grad 0.671 ms
    warp                 fwd 0.150 ms          fwd+bwd 0.168 ms
    splat[pallas_banded] fwd 0.232 ms          fwd+bwd 0.462 ms
    splat[pallas]        fwd 0.211 ms          fwd+bwd 0.577 ms
    post-splat chain     fwd 0.225 ms          fwd+bwd 0.250 ms
    sum of isolated stages: fwd 0.587 / fwd+bwd 0.994 ms — XLA fuses the
    real chain well below the isolated-stage sum.

Conclusion: the earlier ~1.5 ms value&grad reading was dominated by
dispatch, not compute — amortized in-dispatch cost is 0.67 ms. Per-level
counts on the bench workload (CPU, same math) complete the picture: the
~85-93 ms rotated-chain p50 is ~60-93 value&grad iterations per window
(every level terminates on line-search exhaustion at the f32 noise floor,
status 2, and the reference-parity extra-attempt retry re-runs levels 0/1)
plus ~185 value-only probes; iters*0.671 + probes*0.25 reproduces the
measured p50. No hidden per-eval fixed cost to shave; fewer-eval levers
measured no-win (armijo_interpolate eats its savings in rescues; Hessian
warm-start no-win), leaving only a faster splat backward (0.46 of the
0.67 ms) — itself at its formulation floor per the roofline.
"""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from eincm_tpu.models.loss import (
    LossParams,
    compute_window_statics,
    solver_loss,
)
from eincm_tpu.models.objectives import (
    compute_mean_gradient_magnitude,
    compute_mean_squared_error,
)
from eincm_tpu.models.pyramid import SolverConfig
from eincm_tpu.ops.normalize import normalize_to_unit_range
from eincm_tpu.ops.splat import set_splat_impl, splat_multi_ref
from eincm_tpu.ops.warp import warp_events_multi_ref_coarse
from eincm_tpu.utils.benchmarks import (
    MVSEC_H,
    MVSEC_W,
    MVSEC_N_EVENTS,
    stage_mvsec_windows,
)

H, W = MVSEC_H, MVSEC_W
PARAMS = LossParams(alpha=20.0, beta=35.0, gamma=0.0, delta=0.0)


def best_of(fn, rounds=5, iters=200):
    """Best seed-perturbed round; ms per call.

    MVSEC-scale stages run well under 1 ms, below the relay's ~1 ms
    per-dispatch floor — a first attempt that chained `iters` host
    dispatches per round read ~1.1 ms for EVERY stage (even fwd+bwd below
    fwd), i.e. pure dispatch latency. So the repetition loop must live
    INSIDE one jitted dispatch: a fori_loop whose body re-evaluates the
    stage with a loop-index-dependent seed (the same seed*1e-6 input
    perturbation the DSEC breakdown uses to defeat CSE/hoisting), costing
    one dispatch + one scalar readback per round.
    """

    @jax.jit
    def run(seed0):
        def body(i, acc):
            return acc + fn(seed0 + jnp.float32(i))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(run(jnp.float32(0.0)))  # compile + sync
    best = float("inf")
    for r in range(rounds):
        t0 = time.perf_counter()
        float(run(jnp.float32(r + 1)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    set_splat_impl("pallas_banded")
    staged, _ = stage_mvsec_windows(n_windows=1)
    w = staged[0]
    cfg = SolverConfig(
        n_pyr_lvls=5,
        sensor_size=(H, W),
        params=PARAMS,
        theta_opt_maxiters=(40, 33, 25, 18, 10),
    )
    statics = cfg.loss_statics
    wstats = compute_window_statics(w.xs, w.ys, w.edges, (H, W))
    rng = np.random.default_rng(0)
    theta = jnp.asarray(
        rng.normal(0, 0.5, (*cfg.level_shape(0), 2)).astype(np.float32)
    )

    def loss_of(theta, seed):
        return solver_loss(
            theta + seed * 1e-6, w.xs, w.ys, w.ts, w.edges, w.edge_ts,
            PARAMS, 0, statics, wstats,
        )

    val = jax.jit(loss_of)
    vg = jax.jit(
        lambda t, s: (lambda out: out[0] + out[1].sum())(
            jax.value_and_grad(loss_of)(t, s)
        )
    )
    t_val = best_of(lambda s: val(theta, s))
    t_vg = best_of(lambda s: vg(theta, s))
    print(f"solver_loss      value-only {t_val:.3f} ms   value&grad {t_vg:.3f} ms")

    # ---- warp stage (coarse-grid interp + displacement)
    warp_f = jax.jit(
        lambda t, s: sum(
            x.sum()
            for x in warp_events_multi_ref_coarse(
                t + s * 1e-6, w.xs, w.ys, w.ts, w.edge_ts, (H, W)
            )
        )
    )
    cot_e = jnp.asarray(
        rng.normal(0, 1, (2, w.edges.shape[0], MVSEC_N_EVENTS)).astype(np.float32)
    )
    warp_vg = jax.jit(
        lambda t, s: (lambda out: out[0] + out[1].sum())(
            jax.value_and_grad(
                lambda tt: (
                    lambda wxy: jnp.vdot(wxy[0], cot_e[0])
                    + jnp.vdot(wxy[1], cot_e[1])
                )(
                    warp_events_multi_ref_coarse(
                        tt + s * 1e-6, w.xs, w.ys, w.ts, w.edge_ts, (H, W)
                    )
                )
            )(t)
        )
    )
    t_wf = best_of(lambda s: warp_f(theta, s))
    t_wvg = best_of(lambda s: warp_vg(theta, s))
    print(f"warp             fwd {t_wf:.3f} ms   fwd+bwd {t_wvg:.3f} ms")

    # ---- splat stage (given fixed warped coords)
    wx, wy = jax.jit(
        lambda t: warp_events_multi_ref_coarse(
            t, w.xs, w.ys, w.ts, w.edge_ts, (H, W)
        )
    )(theta)
    wx, wy = jnp.asarray(wx), jnp.asarray(wy)
    cot_f = jnp.asarray(
        rng.normal(0, 1, (w.edges.shape[0], H, W)).astype(np.float32)
    )

    for impl in ("pallas_banded", "pallas"):
        set_splat_impl(impl)
        splat_f = jax.jit(
            lambda s: splat_multi_ref(wx + s * 1e-6, wy, (H, W)).sum()
        )
        splat_vg = jax.jit(
            lambda s: (lambda out: out[0] + out[1].sum())(
                jax.value_and_grad(
                    lambda d: jnp.vdot(
                        splat_multi_ref(wx + d, wy, (H, W)), cot_f
                    )
                )(s * 1e-6)
            )
        )
        t_sf = best_of(lambda s: splat_f(s))
        t_svg = best_of(lambda s: splat_vg(s))
        print(f"splat[{impl:14s}] fwd {t_sf:.3f} ms   fwd+bwd {t_svg:.3f} ms")
    set_splat_impl("pallas_banded")

    # ---- post-splat loss chain (given fixed IWEs)
    iwes = jnp.asarray(jax.jit(lambda: splat_multi_ref(wx, wy, (H, W)))())
    from eincm_tpu.models.loss import EPSN, compute_weights_for_multi_reference

    mrw = jnp.asarray(
        compute_weights_for_multi_reference(n_refs=w.edges.shape[0]),
        jnp.float32,
    )

    def chain(iwes):
        niwes = jax.vmap(normalize_to_unit_range)(iwes)
        corrs = -jax.vmap(compute_mean_squared_error)(w.edges, niwes)
        contrasts = jax.vmap(compute_mean_gradient_magnitude)(iwes)
        rel_corrs = (mrw * corrs) / (wstats.zero_corrs + EPSN)
        rel_contrasts = (mrw * contrasts) / (wstats.zero_contrast + EPSN)
        return PARAMS.alpha * (-rel_contrasts.mean()) + PARAMS.beta * (
            -rel_corrs.mean()
        )

    chain_f = jax.jit(lambda s: chain(iwes + s * 1e-6))
    chain_vg = jax.jit(
        lambda s: (lambda out: out[0] + out[1].sum())(
            jax.value_and_grad(lambda d: chain(iwes + d))(s * 1e-6)
        )
    )
    t_cf = best_of(lambda s: chain_f(s))
    t_cvg = best_of(lambda s: chain_vg(s))
    print(f"post-splat chain fwd {t_cf:.3f} ms   fwd+bwd {t_cvg:.3f} ms")

    print(
        f"# sum of stages: fwd {t_wf + t_sf + t_cf:.3f} ms "
        f"vs full value-only {t_val:.3f} ms;  "
        f"fwd+bwd {t_wvg + t_svg + t_cvg:.3f} ms "
        f"vs full value&grad {t_vg:.3f} ms"
    )


if __name__ == "__main__":
    main()
