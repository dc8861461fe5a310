from gssd_tpu.parallel.mesh import (  # noqa: F401
    ParallelPlan,
    jit_plan_eval_step,
    jit_plan_infer_step,
    jit_plan_train_step,
    make_mesh,
    plan_parallelism,
    shard_batch,
    shard_train_step,
)
from gssd_tpu.parallel.folds import stack_states, vmap_train_step  # noqa: F401
