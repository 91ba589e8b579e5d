from neural_image_compression_tpu.models.components import (
    Encoder5x5, Decoder5x5, Encoder3x3, Decoder3x3,
    HyperEncoder5x5, HyperDecoder5x5, HyperEncoder3x3, HyperDecoder3x3,
    LatentSpaceTransform,
)
from neural_image_compression_tpu.models.parameters import EntropyParameters
from neural_image_compression_tpu.models.joint_ar import (
    JointAutoregressiveHierarchical, HierarchicalMixtureResidual,
    noise_quantize, round_quantize, quantize,
)
from neural_image_compression_tpu.models.factorized_prior import FactorizedPrior
from neural_image_compression_tpu.models.hyperprior import MeanScaleHyperprior
from neural_image_compression_tpu.models.checkerboard import (
    CheckerboardContext, CheckerboardHierarchical, checkerboard_mask,
)
from neural_image_compression_tpu.models.channel_cb import (
    ChannelCheckerboardHierarchical, default_groups,
)
from neural_image_compression_tpu.models.gained import (
    GainedChannelCheckerboard, GainedCheckerboard, GainedHyperprior,
    GainedJointAR, fold_gains, folded_model, interp_gain, level_for_bpp,
)
from neural_image_compression_tpu.models.scalable import ScalableImageCoding
from neural_image_compression_tpu.models.vision import (
    FirstHalf, FrozenActivationBlock, GraphBackbone, SecondHalf,
)
from neural_image_compression_tpu.models.backbones import (
    C3, SPPF, Concat, ConvBNSiLU, build_yolo_backbone, distillation_targets,
    frozen_activation_from_conv, load_backbone, save_backbone,
)

__all__ = [
    "Encoder5x5", "Decoder5x5", "Encoder3x3", "Decoder3x3",
    "HyperEncoder5x5", "HyperDecoder5x5", "HyperEncoder3x3", "HyperDecoder3x3",
    "LatentSpaceTransform", "EntropyParameters",
    "JointAutoregressiveHierarchical", "HierarchicalMixtureResidual",
    "FactorizedPrior", "MeanScaleHyperprior", "ScalableImageCoding",
    "CheckerboardHierarchical", "CheckerboardContext", "checkerboard_mask",
    "ChannelCheckerboardHierarchical", "default_groups",
    "GainedJointAR", "GainedHyperprior", "GainedCheckerboard",
    "GainedChannelCheckerboard",
    "fold_gains", "folded_model", "interp_gain",
    "level_for_bpp",
    "FirstHalf", "SecondHalf", "GraphBackbone", "FrozenActivationBlock",
    "ConvBNSiLU", "C3", "SPPF", "Concat", "build_yolo_backbone",
    "frozen_activation_from_conv", "save_backbone", "load_backbone",
    "distillation_targets",
    "noise_quantize", "round_quantize", "quantize",
]
