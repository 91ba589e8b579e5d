from neural_image_compression_tpu.train import loss
from neural_image_compression_tpu.train.loss import (
    msssim_rd_loss, rd_loss, vision_rd_loss,
)
from neural_image_compression_tpu.train.trainer import Trainer
from neural_image_compression_tpu.train.schedulers import ReduceLROnPlateau, cosine_lr
from neural_image_compression_tpu.train.metrics_logger import MetricsLogger
from neural_image_compression_tpu.train.sweep import (
    gained_rd_curve, lambda_sweep, plot_rd_curve, vmapped_lambda_sweep,
)

__all__ = ["loss", "rd_loss", "msssim_rd_loss", "vision_rd_loss", "Trainer",
           "ReduceLROnPlateau", "cosine_lr", "MetricsLogger",
           "gained_rd_curve", "lambda_sweep", "plot_rd_curve",
           "vmapped_lambda_sweep"]
