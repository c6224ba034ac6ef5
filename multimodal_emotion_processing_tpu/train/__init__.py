from .engine import TrainState, make_train_step, make_eval_step, Trainer  # noqa: F401
