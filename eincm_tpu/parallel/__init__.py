from eincm_tpu.parallel.batch import (
    make_window_mesh,
    sequence_shard_solve,
    solve_window_batch,
    solve_window_batch_sharded,
    two_pass_sequence_solve,
)
from eincm_tpu.parallel.distributed import (
    DistributedConfig,
    initialize_distributed,
    is_multi_process,
    process_info,
)
