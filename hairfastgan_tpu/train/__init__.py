from hairfastgan_tpu.train.common import TrainState, make_train_step  # noqa: F401
