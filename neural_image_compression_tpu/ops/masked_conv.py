"""Causal (PixelCNN-style) masked convolution — functional masking.

Capability parity with ContextModels.py:3-20 (mask types 'A'/'B'): mask zeroes
the kernel from the center pixel onward ('A') / after the center ('B') in the
middle row and all rows below, enforcing a raster-scan causal receptive field.

TPU-first difference: the reference multiplies `self.weight.data` by the mask
in place at every forward (ContextModels.py:19), which is a mutation XLA cannot
trace. Here the mask is a constant applied functionally (`kernel * mask`) so
the op stays pure, jit-safe, and fuses into the conv.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from neural_image_compression_tpu.ops.conv import conv2d, torch_bias_init, torch_kernel_init


def causal_mask(kernel_size: int, mask_type: str = "A") -> np.ndarray:
    """(kh, kw, 1, 1) raster-scan causal mask."""
    assert mask_type in ("A", "B")
    k = kernel_size
    mask = np.ones((k, k, 1, 1), np.float32)
    center = k // 2
    mask[center, center + (1 if mask_type == "B" else 0):, :, :] = 0.0
    mask[center + 1:, :, :, :] = 0.0
    return mask


class MaskedConv2d(nn.Module):
    features: int
    kernel_size: int = 5
    mask_type: str = "A"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param("kernel", torch_kernel_init, (k, k, in_ch, self.features))
        bias = self.param("bias", torch_bias_init(k * k * in_ch), (self.features,))
        mask = jnp.asarray(causal_mask(k, self.mask_type))
        kernel = kernel * mask
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
        return conv2d(x, kernel, bias, stride=1, padding=k // 2)


class ContextModel(nn.Module):
    """Masked 5x5 conv, M -> 2M channels (ContextModels.py:23-36)."""

    latent_channels: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, y: jax.Array) -> jax.Array:
        return MaskedConv2d(2 * self.latent_channels, 5, "A", dtype=self.dtype)(y)
