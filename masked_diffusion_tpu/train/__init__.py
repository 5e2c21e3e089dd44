from masked_diffusion_tpu.train.optim import build_optimizer, build_lr_schedule  # noqa: F401
from masked_diffusion_tpu.train.step import TrainState, make_train_step, create_train_state  # noqa: F401
