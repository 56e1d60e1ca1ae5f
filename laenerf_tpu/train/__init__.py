from .trainer import Trainer, TrainState, train_step, occ_update, make_optimizer
from .metrics import psnr, ssim, psnr_meter, ssim_meter, LPIPSMeter
from .checkpoints import CheckpointManager, save_pytree, load_pytree
from .losses import mape_loss, huber_loss, eff_distloss
