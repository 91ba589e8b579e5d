from neural_image_compression_tpu.utils.profiling import StepTimer, trace
from neural_image_compression_tpu.utils.checkpoint import (
    checkpoint_exists, restore_checkpoint, restore_raw, save_checkpoint,
)
from neural_image_compression_tpu.utils.flops import (
    factorized_prior_eval_flops, joint_ar_eval_flops, mfu, scalable_eval_flops,
)
from neural_image_compression_tpu.utils.torch_import import (
    joint_ar_params_from_torch, load_reference_checkpoint,
    yolo_backbone_variables_from_torch,
    scalable_params_from_torch,
)

__all__ = ["checkpoint_exists", "restore_checkpoint", "restore_raw",
           "save_checkpoint", "StepTimer", "trace",
           "factorized_prior_eval_flops", "joint_ar_eval_flops", "mfu",
           "scalable_eval_flops",
           "joint_ar_params_from_torch", "load_reference_checkpoint",
           "yolo_backbone_variables_from_torch",
           "scalable_params_from_torch"]
