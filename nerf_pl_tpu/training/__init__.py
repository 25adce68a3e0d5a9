from .losses import loss_dict, mse_loss
from .metrics import mse, psnr, ssim
from .optimizers import get_optimizer
from .lr_schedule import get_lr_schedule

__all__ = ["loss_dict", "mse_loss", "mse", "psnr", "ssim",
           "get_optimizer", "get_lr_schedule"]
