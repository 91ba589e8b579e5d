from neural_image_compression_tpu.ops.bound import lower_bound, upper_bound, nonneg, nonneg_init
from neural_image_compression_tpu.ops.math import gaussian_cdf, nats_to_bits, LOG2
from neural_image_compression_tpu.ops.conv import (
    Conv2d, Deconv2d, SubpelConv3x3, TransposedDeconv3x3, conv2d, deconv2d, pixel_shuffle,
)
from neural_image_compression_tpu.ops.gdn import GDN
from neural_image_compression_tpu.ops.blocks import (
    ResidualBlock, ResidualBlockUpsample, ResidualBlockWithStride, leaky_relu,
)
from neural_image_compression_tpu.ops.masked_conv import MaskedConv2d, ContextModel, causal_mask

__all__ = [
    "lower_bound", "upper_bound", "nonneg", "nonneg_init",
    "gaussian_cdf", "nats_to_bits", "LOG2",
    "Conv2d", "Deconv2d", "SubpelConv3x3", "TransposedDeconv3x3",
    "conv2d", "deconv2d", "pixel_shuffle",
    "GDN",
    "ResidualBlock", "ResidualBlockUpsample", "ResidualBlockWithStride", "leaky_relu",
    "MaskedConv2d", "ContextModel", "causal_mask",
]
