"""Residual building blocks (capability parity with Layers.py:27-119).

All NHWC. GDN/IGDN placement, LeakyReLU slopes (torch default 0.01), and the
1x1 skip rules match the reference blocks:
  * ResidualBlockWithStride — Layers.py:27-58
  * ResidualBlockUpsample   — Layers.py:61-86 (upsample via TransposedDeconv3x3,
    mirroring the reference's active wiring; subpel variant kept available)
  * ResidualBlock           — Layers.py:89-119
"""

from typing import Any, Optional

import jax
from flax import linen as nn

from neural_image_compression_tpu.ops.conv import Conv2d, TransposedDeconv3x3
from neural_image_compression_tpu.ops.gdn import GDN


def leaky_relu(x: jax.Array) -> jax.Array:
    return nn.leaky_relu(x, negative_slope=0.01)


class ResidualBlockWithStride(nn.Module):
    features: int
    stride: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        out = Conv2d(self.features, 3, self.stride, 1, dtype=self.dtype)(x)
        out = leaky_relu(out)
        out = Conv2d(self.features, 3, 1, 1, dtype=self.dtype)(out)
        out = GDN(dtype=self.dtype)(out)
        if self.stride != 1 or in_ch != self.features:
            identity = Conv2d(self.features, 1, self.stride, 0, dtype=self.dtype)(x)
        else:
            identity = x
        return out + identity


class ResidualBlockUpsample(nn.Module):
    features: int
    upsample: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        out = TransposedDeconv3x3(self.features, self.upsample,
                                  dtype=self.dtype)(x, training)
        out = leaky_relu(out)
        out = Conv2d(self.features, 3, 1, 1, dtype=self.dtype)(out)
        out = GDN(inverse=True, dtype=self.dtype)(out)
        identity = TransposedDeconv3x3(self.features, self.upsample,
                                       dtype=self.dtype)(x, training)
        return out + identity


class ResidualBlock(nn.Module):
    features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        out = Conv2d(self.features, 3, 1, 1, dtype=self.dtype)(x)
        out = leaky_relu(out)
        out = Conv2d(self.features, 3, 1, 1, dtype=self.dtype)(out)
        out = leaky_relu(out)
        if in_ch != self.features:
            identity = Conv2d(self.features, 1, 1, 0, dtype=self.dtype)(x)
        else:
            identity = x
        return out + identity
