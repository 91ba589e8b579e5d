from neural_image_compression_tpu.utils.checkpoint import (
    checkpoint_exists, restore_checkpoint, save_checkpoint,
)

__all__ = ["checkpoint_exists", "restore_checkpoint", "save_checkpoint"]
