from gssd_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    shard_train_step,
)
from gssd_tpu.parallel.folds import stack_states, vmap_train_step  # noqa: F401
