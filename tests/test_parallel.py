"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eincm_tpu.models.loss import LossParams
from eincm_tpu.models.pyramid import (
    HandoverSettings,
    SolverConfig,
    WindowSample,
    solve_window,
)
from eincm_tpu.parallel.batch import (
    make_window_mesh,
    sequence_shard_solve,
    solve_window_batch,
    solve_window_batch_sharded,
    two_pass_sequence_solve,
)


def tiny_cfg(H=16, W=16):
    return SolverConfig(
        n_pyr_lvls=2,
        sensor_size=(H, W),
        params=LossParams(alpha=10.0, beta=5.0),
        theta_opt_maxiters=(3, 3),
        handover=HandoverSettings(use_handover=True, alpha_handover=0.4),
        max_ls_evals=5,
    )


def tiny_batch(rng, b, H=16, W=16, n_events=128):
    return WindowSample(
        xs=jnp.asarray(rng.integers(0, W, (b, n_events)).astype(np.float32)),
        ys=jnp.asarray(rng.integers(0, H, (b, n_events)).astype(np.float32)),
        ts=jnp.asarray(rng.uniform(0, 1, (b, n_events)).astype(np.float32)),
        edges=jnp.asarray(rng.uniform(0, 1, (b, 2, H, W)).astype(np.float32)),
        edge_ts=jnp.tile(jnp.asarray([0.0, 1.0], jnp.float32), (b, 1)),
    )


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_batch_matches_single(rng):
    cfg = tiny_cfg()
    batch = tiny_batch(rng, 3)
    out = solve_window_batch(cfg, batch, is_first=True)
    single = solve_window(
        cfg,
        jax.tree_util.tree_map(lambda x: x[1], batch),
        [z for z in cfg.zero_pyramid()],
        is_first_sample=True,
    )
    np.testing.assert_allclose(
        np.asarray(out.final_theta_pyr[0][1]),
        np.asarray(single.final_theta_pyr[0]),
        rtol=2e-4, atol=1e-5,
    )


def test_sharded_matches_unsharded(rng):
    cfg = tiny_cfg()
    batch = tiny_batch(rng, 8)
    mesh = make_window_mesh()
    sharded = solve_window_batch_sharded(cfg, batch, mesh, is_first=True)
    local = solve_window_batch(cfg, batch, is_first=True)
    # sharded vs unsharded compilations reorder f32 reductions; the iterative
    # solve amplifies the difference slightly — this checks equivalence, not
    # bit-identity.
    np.testing.assert_allclose(
        np.asarray(sharded.final_theta_pyr[0]),
        np.asarray(local.final_theta_pyr[0]),
        rtol=1e-2, atol=5e-3,
    )
    # outputs actually sharded over the mesh
    assert len(sharded.final_theta_pyr[0].sharding.device_set) == 8


def test_two_pass_sequence(rng):
    cfg = tiny_cfg()
    batch = tiny_batch(rng, 8)
    mesh = make_window_mesh()
    pass2, final = two_pass_sequence_solve(cfg, batch, mesh)
    assert final[0].shape[0] == 8
    assert np.all(np.isfinite(np.asarray(final[0])))


def _sequential_chain(cfg, batch, b):
    """Reference schedule: strict sequential solve with handover chain."""
    prior = [z for z in cfg.zero_pyramid()]
    results = []
    for i in range(b):
        w = jax.tree_util.tree_map(lambda x: x[i], batch)
        res = solve_window(cfg, w, prior, is_first_sample=(i == 0))
        prior = res.final_theta_pyr
        results.append(res)
    return results


def test_sequence_shard_prior_exchange(rng):
    """sequence_shard_solve == sequential handover chain within tolerance.

    Chunks: 2 windows per device over 4 devices. Device 0's chunk follows
    the exact sequential schedule (must match tightly); later chunks see
    their boundary prior via ppermute from the neighbor's pass-1 chunk end
    (approximate only through the boundary)."""
    cfg = tiny_cfg()
    b = 8
    batch = tiny_batch(rng, b)
    mesh = make_window_mesh(4)
    res, final = sequence_shard_solve(cfg, batch, mesh)
    seq = _sequential_chain(cfg, batch, b)

    # chunk 0 (windows 0-1) runs the identical chain -> tight match
    for i in (0, 1):
        np.testing.assert_allclose(
            np.asarray(final[0][i]),
            np.asarray(seq[i].final_theta_pyr[0]),
            rtol=1e-2, atol=5e-3,
        )
    # all windows finite and close to the sequential schedule: the only
    # approximation is the chunk-boundary prior (pass-1 instead of pass-2
    # neighbor final), which perturbs but must not derail the solve
    seq0 = np.stack([np.asarray(s.final_theta_pyr[0]) for s in seq])
    par0 = np.asarray(final[0])
    assert np.all(np.isfinite(par0))
    scale = np.abs(seq0).max() + 1e-6
    assert np.max(np.abs(par0 - seq0)) / scale < 0.35, (
        np.max(np.abs(par0 - seq0)) / scale
    )
    # handover weights recorded for every window
    assert res.final_handover_weights[0].shape[0] == b


def test_sequence_schedules_with_collect_intermediate(rng):
    """Regression (round-3 review): with collect_intermediate=True and a
    solved handover level, first-sample SolveResults used to carry
    handover_histories=(None, ...) while non-first ones carried arrays, and
    the tree_map splices in both parallel schedules crashed on the
    structure mismatch. Both schedules must run and record histories."""
    import dataclasses

    cfg = dataclasses.replace(
        tiny_cfg(),
        collect_intermediate=True,
        handover=HandoverSettings(
            use_handover=True, solve_handover_for_levels=(0,)
        ),
    )
    batch = tiny_batch(rng, 8)
    mesh = make_window_mesh(4)

    res_tp, final_tp = two_pass_sequence_solve(cfg, batch, mesh)
    assert np.all(np.isfinite(np.asarray(final_tp[0])))
    # every window's level-0 handover history has identical structure;
    # window 0 (first-sample, pass-1 kept) records an empty one
    h0 = res_tp.handover_histories[0]
    assert h0.xs.shape[0] == 8
    assert int(np.asarray(h0.n)[0]) == 0  # window 0: first-sample, empty
    assert int(np.asarray(h0.n)[1]) > 0  # later windows: real probes

    res_ss, final_ss = sequence_shard_solve(cfg, batch, mesh)
    assert np.all(np.isfinite(np.asarray(final_ss[0])))
    h0 = res_ss.handover_histories[0]
    assert int(np.asarray(h0.n)[0]) == 0
    assert int(np.asarray(h0.n)[1]) > 0


def test_sequence_shard_single_device_matches_sequential(rng):
    """n_dev == 1 without a boundary prior takes the pass-1-only fast path,
    which IS the exact sequential chain."""
    cfg = tiny_cfg()
    b = 4
    batch = tiny_batch(rng, b)
    mesh = make_window_mesh(1)
    res, final = sequence_shard_solve(cfg, batch, mesh)
    seq = _sequential_chain(cfg, batch, b)
    seq0 = np.stack([np.asarray(s.final_theta_pyr[0]) for s in seq])
    np.testing.assert_allclose(
        np.asarray(final[0]), seq0, rtol=1e-2, atol=5e-3
    )


def test_sequence_shard_single_device_with_boundary(rng):
    """n_dev == 1 WITH a carried boundary prior (a checkpointed super-step
    resume) runs ONE chunk chain seeded by it — regression (round-3 review):
    it used to run the full two-pass schedule, solving every window twice
    and discarding pass 1 wholesale. Must match the sequential chain seeded
    with the same prior."""
    cfg = tiny_cfg()
    b = 4
    batch = tiny_batch(rng, b)
    mesh = make_window_mesh(1)
    bp = tuple(
        jnp.asarray(rng.normal(0, 0.1, z.shape).astype(np.float32))
        for z in cfg.zero_pyramid()
    )
    res, final = sequence_shard_solve(cfg, batch, mesh, boundary_prior=bp)

    prior = list(bp)
    seq = []
    for i in range(b):
        w = jax.tree_util.tree_map(lambda x, _i=i: x[_i], batch)
        r = solve_window(cfg, w, prior, is_first_sample=False)
        prior = r.final_theta_pyr
        seq.append(r)
    seq0 = np.stack([np.asarray(s.final_theta_pyr[0]) for s in seq])
    np.testing.assert_allclose(
        np.asarray(final[0]), seq0, rtol=1e-2, atol=5e-3
    )


def test_make_window_mesh_rejects_oversized():
    with pytest.raises(ValueError, match="8 JAX devices"):
        make_window_mesh(16)


def test_distributed_config_plumbing():
    from eincm_tpu.experiments.config import ExperimentConfig
    from eincm_tpu.parallel.distributed import (
        DistributedConfig,
        initialize_distributed,
    )

    # disabled -> no-op, never touches the coordinator machinery
    assert initialize_distributed(DistributedConfig(enable=False)) is False

    cfg = ExperimentConfig.from_dict(
        {
            "distributed": {
                "enable": False,
                "coordinator_address": "localhost:1234",
                "num_processes": 2,
                "process_id": 0,
            }
        }
    )
    assert cfg.distributed.coordinator_address == "localhost:1234"
    d = cfg.to_dict()
    assert d["distributed"]["num_processes"] == 2


def test_graft_entry_dryrun():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)

    fn, args = mod.entry()
    loss, grad = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    assert grad.shape == args[0].shape
