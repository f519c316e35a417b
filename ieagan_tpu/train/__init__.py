from ieagan_tpu.train.step import TrainState, init_train_state, make_train_step
from ieagan_tpu.train.ortho import apply_ortho_reg, shared_blacklist
from ieagan_tpu.train.optim import make_optimizer, make_lr_schedule
