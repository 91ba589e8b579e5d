from neural_image_compression_tpu.train import loss
from neural_image_compression_tpu.train.loss import rd_loss, vision_rd_loss

__all__ = ["loss", "rd_loss", "vision_rd_loss"]
