"""Entropy-parameter network (capability parity with ParametersModels.py:8-64).

Three 1x1 convs (hidden 640, LeakyReLU) over the concat of context features
phi and hyper features psi. On TPU a 1x1 conv over NHWC is exactly a
(B*H*W, Cin) x (Cin, Cout) matmul, so this whole network is three MXU matmuls
with fused activations — no kernel work needed.

Outputs:
  * K == 1 ("Mean-Scale Gaussian"): (mu, sigma), each (B, H, W, M);
    sigma = softplus(raw) + 1e-6 (ParametersModels.py:45-48).
  * K > 1 ("Mixture of Gaussians"): (weights, mus, sigmas), each
    (B, H, W, K, M); weights softmaxed over K, sigma softplus + 1e-6
    (ParametersModels.py:50-63). Note the TPU layout is (..., K, M) — channel
    dim stays on lanes — vs the reference's (B, K, M, H, W).
"""

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from neural_image_compression_tpu.ops.blocks import leaky_relu
from neural_image_compression_tpu.ops.conv import Conv2d

SIGMA_FLOOR = 1e-6


class EntropyParameters(nn.Module):
    latent_channels: int = 192
    hyper_latent_channels: int = 192
    K: int = 1
    hidden: int = 640
    dtype: Optional[Any] = None
    # Declared input width override. The default (None) is the reference's
    # context+hyper concat, 2M + 2H (ParametersModels.py:22). Context-free
    # assemblies (models/hyperprior.py) pass 2*hyper_latent_channels: the
    # first GEMM then contracts over 2M lanes instead of feeding a zeroed
    # context half through 4M.
    input_channels: Optional[int] = None

    @property
    def distribution(self) -> str:
        return "Mean-Scale Gaussian" if self.K == 1 else "Mixture of Gaussians"

    @nn.compact
    def __call__(self, combined: jax.Array) -> Tuple[jax.Array, ...]:
        m, k = self.latent_channels, self.K
        # hyper_latent_channels mirrors the reference constructor
        # (ParametersModels.py:22); make it load-bearing by validating the
        # declared input width (phi 2M + psi 2H) instead of silently
        # accepting whatever arrives
        if self.input_channels is not None:
            expected = self.input_channels
            detail = "declared input_channels"
        else:
            expected = 2 * m + 2 * self.hyper_latent_channels
            detail = (f"2*{m} context + 2*{self.hyper_latent_channels} hyper")
        if combined.shape[-1] != expected:
            raise ValueError(
                f"EntropyParameters expected {expected} input channels "
                f"({detail}), got {combined.shape[-1]}")
        out_ch = 2 * m if k == 1 else 3 * k * m
        h = Conv2d(self.hidden, 1, dtype=self.dtype)(combined)
        h = leaky_relu(h)
        h = Conv2d(self.hidden, 1, dtype=self.dtype)(h)
        h = leaky_relu(h)
        out = Conv2d(out_ch, 1, dtype=self.dtype)(h).astype(jnp.float32)

        if k == 1:
            mu, sigma_raw = jnp.split(out, 2, axis=-1)
            sigma = jax.nn.softplus(sigma_raw) + SIGMA_FLOOR
            return mu, sigma

        b, hh, ww, _ = out.shape
        w_raw, mu_raw, sigma_raw = jnp.split(out, 3, axis=-1)
        # [B,H,W,K*M] -> [B,H,W,K,M]
        w_raw = w_raw.reshape(b, hh, ww, k, m)
        mus = mu_raw.reshape(b, hh, ww, k, m)
        sigma_raw = sigma_raw.reshape(b, hh, ww, k, m)
        weights = jax.nn.softmax(w_raw, axis=-2)
        sigmas = jax.nn.softplus(sigma_raw) + SIGMA_FLOOR
        return weights, mus, sigmas
