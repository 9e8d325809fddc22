"""Shared benchmark workloads (bench.py + scripts/interp_ab.py): the
MVSEC-scale solve-latency harness and the DSEC-scale warp+splat throughput
workload.

One definition of each benchmark workload so paired A/B scripts and the
driver bench can never drift apart (they previously carried near-identical
copies of this setup).

Honesty of the workload: windows are staged from loaders whose ground-truth
velocity ROTATES by ``rotate_deg`` per window at constant speed. With a
constant-velocity sequence every window in the handover chain shares one
optimum, so from the second round on each solve starts essentially at its
solution and the measured latency is near-converged refinement, not
steady-state sequential cost. With rotation, the prior entering window k is
always ~``rotate_deg`` away from window k's optimum — every solve in every
round performs the same bounded adaptation work, which is the sequential
steady state on a scene whose flow varies smoothly (real MVSEC indoor
per-window direction drift at dt=4 is a few degrees; the default 15° is
deliberately harsher).

Reference tuning reproduced: run.sh:41-72 / configs/mvsec_indoor.yaml —
256x336 sensor, 30k events/window, 5 pyramid levels, growing maxiters
(40,33,25,18,10), gtol 1e-4, extra attempts at levels 0/1, handover weight
solved at level 0, 'armijo' line search, row-banded Pallas splat, 2
reference edge maps (Canny + EINCM IEDT surfaces, row-sorted events).
"""

from __future__ import annotations

import time

import numpy as np

MVSEC_H, MVSEC_W = 256, 336
MVSEC_N_EVENTS = 30_000
_SPEED = 5.0  # |V| px/s, matching the round-2 (4, -3) workload magnitude


def stage_mvsec_windows(n_windows: int = 6, rotate_deg: float = 15.0,
                        edge_cfg=None):
    """Stage ``n_windows`` MVSEC-scale windows whose GT velocity rotates
    ``rotate_deg`` per window at constant speed (see module docstring).

    ``edge_cfg`` (an EdgeConfig) overrides the default Canny+IEDT edge
    pipeline — the edge-sensitivity study perturbs it
    (scripts/edge_sensitivity.py).

    Returns (staged_windows, velocities) — each staged entry is the
    device-ready WindowSample, each velocity the window's exact GT (vx, vy).
    """
    from eincm_tpu.data.staging import stage_datasample
    from eincm_tpu.data.synthetic import SyntheticDataLoader
    from eincm_tpu.experiments.config import EdgeConfig

    phi0 = np.arctan2(-3.0, 4.0)  # round-2 workload direction
    if edge_cfg is None:
        edge_cfg = EdgeConfig(
            enable_image_preprocessing=False, smoothen_method="eincm_iedt"
        )
    edge_fn = edge_cfg.make_edge_fn()
    staged, vels = [], []
    for k in range(n_windows):
        phi = phi0 + np.deg2rad(rotate_deg) * k
        vel = (_SPEED * np.cos(phi), _SPEED * np.sin(phi))
        dl = SyntheticDataLoader(
            sensor_size=(MVSEC_H, MVSEC_W),
            n_windows=1,
            des_n_events=MVSEC_N_EVENTS,
            velocity=vel,
            n_features=180,
            seed=1 + k,
        )
        dl.get_ready()
        staged.append(
            stage_datasample(
                dl[0],
                edge_fn=edge_fn,
                preprocess=False,
                pad_to=MVSEC_N_EVENTS,
                sort_by_row=True,
            ).window
        )
        vels.append(vel)
    return staged, vels


def build_mvsec_solve_bench(
    interp_impl: str | None = None,
    rotate_deg: float = 15.0,
    n_windows: int = 6,
    solver_overrides: dict | None = None,
):
    """Build the chained-window solve benchmark.

    Returns ``(one_round, res)`` where ``one_round()`` solves windows
    1..n_windows-1 as a handover chain seeded from window 0's solved
    result (one scalar-readback sync per round — the experiment manager
    pipelines readbacks the same way) and returns seconds per window;
    ``res`` is the warmup window's SolveResult for diagnostics.

    Every round re-runs the SAME chain from the SAME seed, so each
    measured solve's prior is always exactly ``rotate_deg`` away from its
    optimum. (Carrying the chain across rounds instead would hand round
    k+1's first window the LAST window's theta — (n_windows-1)·rotate_deg
    away — giving 1 of the measured windows a different, harder problem
    each round and contradicting the steady-state rationale above.)

    ``interp_impl`` (xla | pallas) is applied BEFORE the solver traces, so
    the compiled executable is pinned to it; None keeps the current default.
    ``solver_overrides`` are extra SolverConfig fields for paired A/Bs of
    solver knobs (e.g. ``{"armijo_interpolate": True}``).
    """
    from eincm_tpu.models.loss import LossParams
    from eincm_tpu.models.pyramid import (
        HandoverSettings,
        SolverConfig,
        make_window_solver,
    )
    from eincm_tpu.ops.splat import set_splat_impl
    from eincm_tpu.ops.warp import set_interp_impl

    set_splat_impl("pallas_banded")
    if interp_impl is not None:
        set_interp_impl(interp_impl)

    staged, _ = stage_mvsec_windows(n_windows, rotate_deg)

    # overrides REPLACE base fields (a plain ** splat would raise
    # "multiple values for keyword argument" on any shared key)
    cfg_kwargs = dict(
        n_pyr_lvls=5,
        sensor_size=(MVSEC_H, MVSEC_W),
        params=LossParams(alpha=20.0, beta=35.0, gamma=0.0, delta=0.0),
        theta_opt_maxiters=(40, 33, 25, 18, 10),
        theta_gtol=1e-4,
        n_extra_attempts={0: 1, 1: 1},
        handover=HandoverSettings(
            use_handover=True, solve_handover_for_levels=(0,)
        ),
        # the SHIPPED SolverSettings default (round-5 ftol study); the
        # driver bench measures what users get. Override with
        # {"theta_ftol": None} for reference-retry-semantics A/Bs.
        theta_ftol=1e-5,
    )
    cfg_kwargs.update(solver_overrides or {})
    cfg = SolverConfig(**cfg_kwargs)
    solver = make_window_solver(cfg)

    # compile both solver variants (is_first toggles the prior handling)
    # + first syncs; jax.block_until_ready does not block on the axon
    # relay, hence the scalar readbacks
    res0 = solver(staged[0], cfg.zero_pyramid(), is_first=True)
    float(res0.final_theta_pyr[0].sum())
    res = solver(staged[1], res0.final_theta_pyr, is_first=False)
    float(res.final_theta_pyr[0].sum())

    seed_pyr = res0.final_theta_pyr

    def one_round() -> float:
        prior = seed_pyr
        t0 = time.perf_counter()
        for k in range(1, n_windows):
            r = solver(staged[k], prior, is_first=False)
            prior = r.final_theta_pyr
        float(prior[0].sum())  # one sync per round
        return (time.perf_counter() - t0) / (n_windows - 1)

    return one_round, res


def build_parallel_solve_bench(
    n_windows: int = 8,
    rotate_deg: float = 15.0,
    solver_overrides: dict | None = None,
):
    """8-window batched solve through the DP path
    (`parallel/batch.py:solve_window_batch_sharded`) on a mesh over ALL
    local devices — the driver's single TPU chip runs an 8-per-device
    `lax.map` schedule (measuring the batched-dispatch solve the parallel
    phases actually execute); with more chips the same call shards.

    Windows reuse the MVSEC solve-bench staging (rotating GT velocity) and
    solve WITHOUT a prior chain (`is_first=True`) — the DP schedule's
    pass-1 regime. Returns ``one_round() -> seconds per window``.
    """
    import jax
    import jax.numpy as jnp

    from eincm_tpu.models.loss import LossParams
    from eincm_tpu.models.pyramid import HandoverSettings, SolverConfig
    from eincm_tpu.ops.splat import set_splat_impl
    from eincm_tpu.parallel.batch import (
        make_window_mesh,
        solve_window_batch_sharded,
    )

    set_splat_impl("pallas_banded")
    staged, _ = stage_mvsec_windows(n_windows, rotate_deg)
    batch = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *staged
    )

    n_dev = len(jax.devices())
    while n_windows % n_dev:
        n_dev -= 1
    mesh = make_window_mesh(n_dev)

    cfg_kwargs = dict(
        n_pyr_lvls=5,
        sensor_size=(MVSEC_H, MVSEC_W),
        params=LossParams(alpha=20.0, beta=35.0, gamma=0.0, delta=0.0),
        theta_opt_maxiters=(40, 33, 25, 18, 10),
        theta_gtol=1e-4,
        n_extra_attempts={0: 1, 1: 1},
        handover=HandoverSettings(
            use_handover=True, solve_handover_for_levels=(0,)
        ),
        theta_ftol=1e-5,  # shipped default (round-5 ftol study)
    )
    cfg_kwargs.update(solver_overrides or {})
    cfg = SolverConfig(**cfg_kwargs)

    # compile + first sync (the relay does not honor block_until_ready)
    res = solve_window_batch_sharded(cfg, batch, mesh, is_first=True)
    float(res.final_theta_pyr[0].sum())

    def one_round() -> float:
        t0 = time.perf_counter()
        r = solve_window_batch_sharded(cfg, batch, mesh, is_first=True)
        float(r.final_theta_pyr[0].sum())
        return (time.perf_counter() - t0) / n_windows

    return one_round, res


DSEC_H, DSEC_W = 480, 640
DSEC_N_EVENTS = 1_500_000
DSEC_N_REFS = 2


def build_dsec_solve_bench(
    n_windows: int = 4,
    rotate_deg: float = 15.0,
    splat_impl: str = "pallas_banded2d",
    solver_overrides: dict | None = None,
):
    """Build the DSEC-scale chained-window solve benchmark (full production
    tuning, run.sh:99-121: 480x640, 1.5M events/window, alpha=2000
    beta=4000, growing maxiters 40..10, extra attempts at levels 0/1,
    handover solved at level 0, tile-sorted staging for the 2-D banded
    splat kernel).

    Same steady-state honesty rationale as the MVSEC harness (module
    docstring): the GT velocity rotates per window so every measured solve
    adapts a genuinely-off prior. Returns ``(one_round, res)`` where
    ``one_round()`` solves windows 1..n_windows-1 as a handover chain from
    window 0's solved seed and returns seconds per window.
    """
    from eincm_tpu.data.staging import stage_datasample
    from eincm_tpu.data.synthetic import SyntheticDataLoader
    from eincm_tpu.experiments.config import EdgeConfig
    from eincm_tpu.models.loss import LossParams
    from eincm_tpu.models.pyramid import (
        HandoverSettings,
        SolverConfig,
        make_window_solver,
    )
    from eincm_tpu.ops.splat import set_splat_impl

    set_splat_impl(splat_impl)
    edge_fn = EdgeConfig(
        enable_image_preprocessing=False, smoothen_method="eincm_iedt"
    ).make_edge_fn()

    speed = 7.2  # |V| px/window, the dsec_scale_parity.py magnitude
    phi0 = np.arctan2(-4.0, 6.0)
    staged = []
    for k in range(n_windows):
        phi = phi0 + np.deg2rad(rotate_deg) * k
        dl = SyntheticDataLoader(
            sensor_size=(DSEC_H, DSEC_W),
            n_windows=1,
            des_n_events=DSEC_N_EVENTS,
            velocity=(speed * np.cos(phi), speed * np.sin(phi)),
            n_features=700,
            seed=3 + k,
        )
        dl.get_ready()
        staged.append(
            stage_datasample(
                dl[0], edge_fn=edge_fn, preprocess=False,
                pad_to=DSEC_N_EVENTS, sort_by_tile=True,
            ).window
        )

    cfg_kwargs = dict(
        n_pyr_lvls=5,
        sensor_size=(DSEC_H, DSEC_W),
        params=LossParams(alpha=2000.0, beta=4000.0, gamma=0.0, delta=0.0),
        theta_opt_maxiters=(40, 33, 25, 18, 10),
        theta_gtol=1e-4,
        n_extra_attempts={0: 1, 1: 1},
        handover=HandoverSettings(
            use_handover=True, solve_handover_for_levels=(0,)
        ),
        # shipped default (round-5 ftol study); {"theta_ftol": None}
        # restores reference retry semantics for parity A/Bs
        theta_ftol=1e-5,
    )
    cfg_kwargs.update(solver_overrides or {})
    cfg = SolverConfig(**cfg_kwargs)
    solver = make_window_solver(cfg)

    res0 = solver(staged[0], cfg.zero_pyramid(), is_first=True)
    float(res0.final_theta_pyr[0].sum())
    res = solver(staged[1], res0.final_theta_pyr, is_first=False)
    float(res.final_theta_pyr[0].sum())
    seed_pyr = res0.final_theta_pyr

    def one_round() -> float:
        prior = seed_pyr
        t0 = time.perf_counter()
        for k in range(1, n_windows):
            r = solver(staged[k], prior, is_first=False)
            prior = r.final_theta_pyr
        float(prior[0].sum())  # one sync per round
        return (time.perf_counter() - t0) / (n_windows - 1)

    return one_round, res


def build_dsec_throughput_bench(
    interp_impl: str | None = None,
    splat_impl: str = "pallas_banded2d",
):
    """Build the DSEC-scale warp+splat throughput workload (the driver's
    headline metric; shared with scripts/interp_ab.py so paired A/Bs can
    never drift from bench.py).

    Workload: 480x640 sensor, 1.5M events, 2 reference times
    (run.sh:99-121 des_n_events=1500000). This is the solver's hot path:
    coarse theta -> fused bilinear interp + warp -> banded MXU splat per
    reference. Events arrive tile-sorted (the DSEC-scale staging mode), so
    the row+column-banded kernel engages; it degrades gracefully to the
    row-banded and full-height kernels when banding is invalid.

    Returns ``one_round()`` -> seconds per warp+splat iteration (10 jitted
    iterations, one scalar-readback sync — the axon relay does not honor
    block_until_ready). Events per iteration = DSEC_N_EVENTS * DSEC_N_REFS.
    """
    import jax
    import jax.numpy as jnp

    from eincm_tpu.data.staging import tile_sort_events
    from eincm_tpu.ops.splat import set_splat_impl, splat_multi_ref
    from eincm_tpu.ops.warp import set_interp_impl, warp_events_multi_ref_coarse

    set_splat_impl(splat_impl)
    if interp_impl is not None:
        set_interp_impl(interp_impl)

    h, w = DSEC_H, DSEC_W
    rng = np.random.default_rng(0)
    xs0 = rng.integers(0, w, DSEC_N_EVENTS).astype(np.float32)
    ys0 = rng.integers(0, h, DSEC_N_EVENTS).astype(np.float32)
    ts0 = rng.uniform(0, 1, DSEC_N_EVENTS).astype(np.float32)
    xs_t, ys_t, ts_t, _ = tile_sort_events(
        xs0, ys0, ts0, np.zeros(DSEC_N_EVENTS, bool), h
    )
    xs, ys, ts = jnp.asarray(xs_t), jnp.asarray(ys_t), jnp.asarray(ts_t)
    t_refs = jnp.asarray(np.linspace(0, 1, DSEC_N_REFS).astype(np.float32))
    theta = jnp.asarray(rng.normal(0, 4, (16, 16, 2)).astype(np.float32))

    @jax.jit
    def warp_splat(theta, seed):
        wx, wy = warp_events_multi_ref_coarse(theta, xs, ys, ts, t_refs, (h, w))
        wx = wx + seed * 1e-6  # defeat caching across iterations
        frames = splat_multi_ref(wx, wy, (h, w))
        return frames.sum()

    # compile + first sync
    float(warp_splat(theta, jnp.float32(0.0)))

    def one_round() -> float:
        iters = 10
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for i in range(iters):
            acc = acc + warp_splat(theta, jnp.float32(i))
        float(acc)  # single sync per round
        return (time.perf_counter() - t0) / iters

    return one_round


def solve_diag_str(res) -> str:
    """One-line diagnostic proving the measured windows do real work.

    `total_iters` counts across retry attempts — the honest iteration count.
    (`iter_num` alone is the LAST attempt only: at the shipped tuning the
    first attempt at levels 0/1 typically exhausts maxiter under the f32
    gtol=1e-4 and the extra-attempt retry fires, so last-attempt counts
    like [3, 5, ...] hide an exhausted 40/33-iteration first attempt —
    exactly the reference's retry semantics, src/eincm/solver.py:218-239.)
    """
    states = res.theta_opt_states
    iters = [int(s.total_iters) for s in states]
    attempts = [int(s.n_attempts) for s in states]
    probes = sum(int(s.n_fun_evals) - int(s.total_iters) for s in states)
    th0 = np.asarray(res.final_theta_pyr[0]).reshape(-1, 2).mean(0)
    return (
        f"total_iters/level={iters} (sum {sum(iters)}) "
        f"attempts/level={attempts} ls_probes={probes} "
        f"f0={float(states[0].fun_val):.4f} "
        f"theta0_mean={th0}"
    )
