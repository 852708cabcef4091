from poet_tpu.engine.train import (  # noqa: F401
    TrainState,
    label_params,
    make_optimizer,
    make_train_step,
)
