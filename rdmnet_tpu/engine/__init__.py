from rdmnet_tpu.engine.train_step import (  # noqa: F401
    create_optimizer,
    create_train_state,
    make_eval_step,
    make_train_step,
)
