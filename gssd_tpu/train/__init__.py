from gssd_tpu.train.state import TrainState, create_train_state  # noqa: F401
from gssd_tpu.train.steps import make_eval_step, make_train_step  # noqa: F401
