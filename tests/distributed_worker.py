"""Multi-process worker for the jax.distributed integration test.

Launched by tests/test_distributed.py as N separate processes. Each process
initializes the distributed runtime (DistributedConfig path), builds a
global mesh over all processes' CPU devices, and runs a sharded multi-window
solve. Process 0 prints a JSON result line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    coord, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from eincm_tpu.parallel.distributed import (
        DistributedConfig,
        initialize_distributed,
        is_multi_process,
    )

    assert initialize_distributed(
        DistributedConfig(
            enable=True,
            coordinator_address=coord,
            num_processes=n_proc,
            process_id=pid,
        )
    )
    assert is_multi_process()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from eincm_tpu.models.loss import LossParams
    from eincm_tpu.models.pyramid import (
        HandoverSettings,
        SolverConfig,
        WindowSample,
        solve_window,
    )
    from functools import partial

    n_dev = jax.device_count()
    local = jax.local_device_count()
    mesh = Mesh(np.array(jax.devices()), axis_names=("windows",))

    H = W = 16
    n_events = 256
    batch = n_dev
    rng = np.random.default_rng(0)

    cfg = SolverConfig(
        n_pyr_lvls=2,
        sensor_size=(H, W),
        params=LossParams(alpha=10.0, beta=5.0),
        theta_opt_maxiters=(2, 2),
        handover=HandoverSettings(use_handover=False),
        max_ls_evals=4,
    )

    # every process builds the same global batch; each puts only its
    # addressable shards (standard multi-host pattern)
    def fields(b):
        return WindowSample(
            xs=rng.integers(0, W, (b, n_events)).astype(np.float32),
            ys=rng.integers(0, H, (b, n_events)).astype(np.float32),
            ts=rng.uniform(0, 1, (b, n_events)).astype(np.float32),
            edges=rng.uniform(0, 1, (b, 2, H, W)).astype(np.float32),
            edge_ts=np.tile(np.asarray([0.0, 1.0], np.float32), (b, 1)),
        )

    global_batch = fields(batch)
    shard = NamedSharding(mesh, P("windows"))
    per_proc = batch // n_proc  # windows owned by this process

    def gmake(x):
        lo = pid * per_proc
        local_data = np.ascontiguousarray(x[lo : lo + per_proc])
        return jax.make_array_from_process_local_data(shard, local_data, x.shape)

    batch_arrays = jax.tree_util.tree_map(gmake, global_batch)
    priors = tuple(
        gmake(np.zeros((batch, *cfg.level_shape(l), 2), np.float32))
        for l in range(cfg.n_pyr_lvls)
    )

    solve = partial(solve_window, cfg, is_first_sample=True)

    def per_device(local_batch, local_priors):
        return jax.lax.map(lambda args: solve(*args), (local_batch, local_priors))

    specs = P("windows")
    fn = jax.jit(
        jax.shard_map(
            per_device, mesh=mesh, in_specs=(specs, specs), out_specs=specs,
            check_vma=False,
        )
    )
    res = fn(batch_arrays, priors)
    # cross-process scalar reduction over the sharded result
    total = float(
        jax.jit(lambda t: sum(jnp.sum(x) for x in t))(res.final_theta_pyr)
    )
    finite = all(
        bool(jnp.all(jnp.isfinite(x.addressable_data(0))))
        for x in res.final_theta_pyr
    )
    if pid == 0:
        print(
            json.dumps(
                {
                    "n_devices": n_dev,
                    "n_processes": jax.process_count(),
                    "local_devices": local,
                    "finite": finite,
                    "total": total,
                }
            )
        )


if __name__ == "__main__":
    main()
