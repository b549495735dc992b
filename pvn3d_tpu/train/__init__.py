from pvn3d_tpu.train.schedule import cyclic_lr, bn_momentum_at  # noqa: F401
from pvn3d_tpu.train.state import TrainState, create_train_state  # noqa: F401
from pvn3d_tpu.train.step import make_train_step, make_eval_step  # noqa: F401
