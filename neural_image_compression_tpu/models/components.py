"""Analysis/synthesis/hyper transform networks (capability parity with
Components.py:6-153). All NHWC; x16 spatial down/up for the main transforms,
x4 more for the hyper pair (z is x64 vs the image).

Variants:
  * 5x5 conv + GDN stacks            (Components.py:6-18, 35-47, 65-75, 94-105)
  * 3x3 residual-block stacks        (Components.py:20-32, 49-62, 77-91, 107-122)
  * LatentSpaceTransform             (Components.py:125-153) — maps base
    latents into a frozen vision backbone's feature space for the scalable
    coding distillation loss.
"""

from typing import Any, Optional, Sequence

import jax
from flax import linen as nn

from neural_image_compression_tpu.ops.blocks import (
    ResidualBlock, ResidualBlockUpsample, ResidualBlockWithStride, leaky_relu,
)
from neural_image_compression_tpu.ops.conv import Conv2d, Deconv2d, TransposedDeconv3x3
from neural_image_compression_tpu.ops.gdn import GDN


class Encoder5x5(nn.Module):
    """4x stride-2 5x5 convs with GDN between (x16 downsample), 3 -> M."""

    latent_channels: int = 192
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        m = self.latent_channels
        for _ in range(3):
            x = Conv2d(m, 5, 2, 2, dtype=self.dtype)(x)
            x = GDN(dtype=self.dtype)(x)
        return Conv2d(m, 5, 2, 2, dtype=self.dtype)(x)  # bottleneck


class Decoder5x5(nn.Module):
    """Mirror of Encoder5x5: 4x stride-2 5x5 deconvs with IGDN, M -> 3."""

    latent_channels: int = 192
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, y: jax.Array, training: bool = False) -> jax.Array:
        m = self.latent_channels
        for _ in range(3):
            y = Deconv2d(m, 5, 2, 2, 1, dtype=self.dtype)(y, training)
            y = GDN(inverse=True, dtype=self.dtype)(y)
        return Deconv2d(3, 5, 2, 2, 1, dtype=self.dtype)(y, training)


class Encoder3x3(nn.Module):
    """Residual-block analysis transform (Components.py:20-32)."""

    latent_channels: int = 192
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        m = self.latent_channels
        for _ in range(3):
            x = ResidualBlockWithStride(m, 2, dtype=self.dtype)(x)
            x = ResidualBlock(m, dtype=self.dtype)(x)
        return Conv2d(m, 3, 2, 1, dtype=self.dtype)(x)  # bottleneck


class Decoder3x3(nn.Module):
    """Residual-block synthesis transform (Components.py:49-62)."""

    latent_channels: int = 192
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, y: jax.Array, training: bool = False) -> jax.Array:
        m = self.latent_channels
        for _ in range(3):
            y = ResidualBlock(m, dtype=self.dtype)(y)
            y = ResidualBlockUpsample(m, 2, dtype=self.dtype)(y, training)
        y = ResidualBlock(m, dtype=self.dtype)(y)
        return TransposedDeconv3x3(3, 2, dtype=self.dtype)(y, training)


class HyperEncoder5x5(nn.Module):
    """y -> z, x4 downsample (Components.py:65-75). Operates on raw y (NOT |y|)."""

    latent_channels: int = 192
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, y: jax.Array) -> jax.Array:
        m = self.latent_channels
        y = Conv2d(m, 3, 1, 1, dtype=self.dtype)(y)
        y = leaky_relu(y)
        y = Conv2d(m, 5, 2, 2, dtype=self.dtype)(y)
        y = leaky_relu(y)
        return Conv2d(m, 5, 2, 2, dtype=self.dtype)(y)


class HyperEncoder3x3(nn.Module):
    """3x3 variant of the hyper-encoder (Components.py:77-91)."""

    latent_channels: int = 192
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, y: jax.Array) -> jax.Array:
        m = self.latent_channels
        y = Conv2d(m, 3, 1, 1, dtype=self.dtype)(y)
        y = leaky_relu(y)
        y = Conv2d(m, 3, 1, 1, dtype=self.dtype)(y)
        y = leaky_relu(y)
        y = Conv2d(m, 3, 2, 1, dtype=self.dtype)(y)
        y = leaky_relu(y)
        y = Conv2d(m, 3, 1, 1, dtype=self.dtype)(y)
        y = leaky_relu(y)
        return Conv2d(m, 3, 2, 1, dtype=self.dtype)(y)


class HyperDecoder5x5(nn.Module):
    """z -> psi with 2*M output channels (Components.py:94-105)."""

    latent_channels: int = 192
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, z: jax.Array, training: bool = False) -> jax.Array:
        m = self.latent_channels
        z = Deconv2d(m, 5, 2, 2, 1, dtype=self.dtype)(z, training)
        z = leaky_relu(z)
        z = Deconv2d(int(1.5 * m), 5, 2, 2, 1, dtype=self.dtype)(z, training)
        z = leaky_relu(z)
        return Conv2d(2 * m, 3, 1, 1, dtype=self.dtype)(z)


class HyperDecoder3x3(nn.Module):
    """3x3 variant of the hyper-decoder (Components.py:107-122)."""

    latent_channels: int = 192
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, z: jax.Array, training: bool = False) -> jax.Array:
        m = self.latent_channels
        z = Conv2d(m, 3, 1, 1, dtype=self.dtype)(z)
        z = leaky_relu(z)
        z = TransposedDeconv3x3(m, 2, dtype=self.dtype)(z, training)
        z = leaky_relu(z)
        z = Conv2d(int(1.5 * m), 3, 1, 1, dtype=self.dtype)(z)
        z = leaky_relu(z)
        z = TransposedDeconv3x3(int(1.5 * m), 2, dtype=self.dtype)(z, training)
        z = leaky_relu(z)
        return Conv2d(2 * m, 3, 1, 1, dtype=self.dtype)(z)


class LatentSpaceTransform(nn.Module):
    """Residual + upsample tower mapping base latents y1 toward a frozen
    vision backbone's feature space (Components.py:125-153)."""

    latent_channels: int = 192
    upsampling_factors: Sequence[int] = (2, 1, 1, 1)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        m = self.latent_channels
        ups = list(self.upsampling_factors)
        for u in ups[:3]:
            x = ResidualBlock(m, dtype=self.dtype)(x)
            x = ResidualBlockUpsample(m, u, dtype=self.dtype)(x, training)
            m *= u
        x = ResidualBlock(m, dtype=self.dtype)(x)
        return Conv2d(m * ups[3], 3, 1, 1, dtype=self.dtype)(x)
