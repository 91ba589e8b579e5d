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

# Largest latent grid (h*w) lowered as gather-GEMM instead of a masked conv.
# 4096 covers the eval/codec regime (Kodak 32x48) and training patches
# (16x16); the A/B data behind the value is tools/ab_maskedconv_train.py and
# the eval numbers in DESIGN.md. Module-level so A/B tools can override.
GATHER_GEMM_MAX_GRID = 4096


def causal_mask(kernel_size: int, mask_type: str = "A") -> np.ndarray:
    """(kh, kw, 1, 1) raster-scan causal mask."""
    assert mask_type in ("A", "B")
    k = kernel_size
    mask = np.ones((k, k, 1, 1), np.float32)
    center = k // 2
    mask[center, center + (1 if mask_type == "B" else 0):, :, :] = 0.0
    mask[center + 1:, :, :, :] = 0.0
    return mask


def causal_positions(kernel_size: int, mask_type: str = "A"):
    """(r, c) taps the causal mask keeps, in raster order."""
    m = causal_mask(kernel_size, mask_type)[:, :, 0, 0]
    return [(r, c) for r in range(kernel_size) for c in range(kernel_size)
            if m[r, c] > 0]


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
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
        h, w = x.shape[1], x.shape[2]
        if h * w <= GATHER_GEMM_MAX_GRID:
            # small latent grids (the eval/codec regime): gather the live
            # taps and run ONE dense GEMM — computes only the ~half of the
            # kernel the mask keeps and tiles better than a 5x5 conv on a
            # tiny grid (A/B on v5e: 2.97 -> 2.45 ms at Kodak batch 48).
            # Mathematically identical to the masked conv.
            pos = causal_positions(k, self.mask_type)
            pad = k // 2
            xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
            gath = jnp.concatenate(
                [xp[:, r:r + h, c:c + w, :] for (r, c) in pos], axis=-1)
            wmat = jnp.concatenate([kernel[r, c] for (r, c) in pos], axis=0)
            out = jnp.einsum("bhwk,ko->bhwo", gath, wmat,
                             preferred_element_type=jnp.float32)
            return out.astype(x.dtype) + bias
        mask = jnp.asarray(causal_mask(k, self.mask_type), kernel.dtype)
        return conv2d(x, kernel * mask, bias, stride=1, padding=k // 2)


class ContextModel(nn.Module):
    """Masked 5x5 conv, M -> 2M channels (ContextModels.py:23-36)."""

    latent_channels: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, y: jax.Array) -> jax.Array:
        return MaskedConv2d(2 * self.latent_channels, 5, "A", dtype=self.dtype)(y)
