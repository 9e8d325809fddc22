from eincm_tpu.parallel.batch import (
    make_window_mesh,
    solve_window_batch,
    solve_window_batch_sharded,
)
