from neural_image_compression_tpu.utils.profiling import StepTimer, trace
from neural_image_compression_tpu.utils.checkpoint import (
    checkpoint_exists, restore_checkpoint, restore_raw, save_checkpoint,
)

__all__ = ["checkpoint_exists", "restore_checkpoint", "restore_raw",
           "save_checkpoint", "StepTimer", "trace"]
