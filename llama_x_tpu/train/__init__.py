from llama_x_tpu.train.optim import get_optimizer, trapezoid_schedule  # noqa: F401
from llama_x_tpu.train.trainer import TrainState, make_train_step  # noqa: F401
