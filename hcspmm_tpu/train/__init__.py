from hcspmm_tpu.train.loop import TrainState, make_train_step, nll_loss, train  # noqa: F401
