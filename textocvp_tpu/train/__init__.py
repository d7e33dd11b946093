from textocvp_tpu.train.losses import build_loss_fn
from textocvp_tpu.train.schedulers import build_lr_schedule, build_optimizer
