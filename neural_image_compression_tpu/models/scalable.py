"""Scalable / progressive two-layer latent coding (Models.py:208-338).

Splits y into base latents y1 (M1 channels) and enhancement latents y2
(M - M1), each with its own masked-conv context model and entropy-parameter
net; both share the hyper features psi. A LatentSpaceTransform maps y1 toward
a frozen vision backbone's feature space (`F_tilde`) for the vision
distillation loss (RateDistortionLoss.py:52-121).

The reference's committed forward is broken (SURVEY §2.3-2: `params1`
assigned twice at Models.py:298-299 so `params2` is undefined; K=1 param keys
mu1/sigma1 don't match `_likelihood(x, mu, sigma)`; stray `debug` positional
arg at :302). This implementation realises the evident intent: per-layer
parameters are computed AND routed correctly to each layer's conditional.
Output keys match the reference contract (Models.py:318-336): x_hat, y, y_in,
y1, y2, z, z_in, p_z, logp_z, p_y1, logp_y1, p_y2, logp_y2, F_tilde, plus
mu1/sigma1/mu2/sigma2 (K=1) or weights1/mus1/sigmas1/weights2/mus2/sigmas2.
"""

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from neural_image_compression_tpu.entropy.factorized import FactorizedEntropyBottleneck
from neural_image_compression_tpu.entropy.gaussian import gaussian_likelihood, mixture_likelihood
from neural_image_compression_tpu.models.components import (
    Decoder5x5, Encoder5x5, HyperDecoder5x5, HyperEncoder5x5, LatentSpaceTransform,
)
from neural_image_compression_tpu.models.joint_ar import noise_quantize, round_quantize
from neural_image_compression_tpu.models.parameters import EntropyParameters
from neural_image_compression_tpu.ops.masked_conv import ContextModel


class ScalableImageCoding(nn.Module):
    latent_channels: int = 192
    base_channels: int = 128
    K: int = 1
    # LST upsampling schedule (Models.py:256 hardcodes [2,1,1,1]; configurable
    # here so the LST resolution can match different backbone cut points)
    lst_upsampling: Sequence[int] = (2, 1, 1, 1)
    dtype: Optional[Any] = None

    def setup(self):
        if self.latent_channels < 1 or self.K < 1:
            raise ValueError("latent_channels and K must be >= 1")
        if not (0 < self.base_channels < self.latent_channels):
            raise ValueError("base_channels must satisfy 0 < M1 < M")
        m, m1 = self.latent_channels, self.base_channels
        m2 = m - m1
        self.encoder = Encoder5x5(latent_channels=m, dtype=self.dtype)
        self.decoder = Decoder5x5(latent_channels=m, dtype=self.dtype)
        self.hyper_encoder = HyperEncoder5x5(latent_channels=m, dtype=self.dtype)
        self.hyper_decoder = HyperDecoder5x5(latent_channels=m, dtype=self.dtype)
        self.factorized_entropy_model = FactorizedEntropyBottleneck(channels=m)
        self.context_model_1 = ContextModel(latent_channels=m1, dtype=self.dtype)
        self.context_model_2 = ContextModel(latent_channels=m2, dtype=self.dtype)
        self.entropy_parameters_1 = EntropyParameters(
            latent_channels=m1, hyper_latent_channels=m, K=self.K, dtype=self.dtype)
        self.entropy_parameters_2 = EntropyParameters(
            latent_channels=m2, hyper_latent_channels=m, K=self.K, dtype=self.dtype)
        self.LST = LatentSpaceTransform(
            latent_channels=m1, upsampling_factors=tuple(self.lst_upsampling),
            dtype=self.dtype)

    @property
    def M1(self):
        return self.base_channels

    @property
    def M2(self):
        return self.latent_channels - self.base_channels

    def __call__(self, x: jax.Array, training: bool = True) -> Dict[str, jax.Array]:
        if x.shape[1] % 64 or x.shape[2] % 64:
            raise ValueError(
                f"H and W must be multiples of 64, got {x.shape[1]}x{x.shape[2]}; "
                f"pad first (data.pad_to_multiple) and crop the output")
        y = self.encoder(x)
        z = self.hyper_encoder(y)

        if training:
            rng = self.make_rng("noise")
            rng_z, rng_y = jax.random.split(rng)
            z_in = noise_quantize(z.astype(jnp.float32), rng_z)
            y_in = noise_quantize(y.astype(jnp.float32), rng_y)
        else:
            z_in = round_quantize(z.astype(jnp.float32))
            y_in = round_quantize(y.astype(jnp.float32))

        y1 = y_in[..., : self.M1]
        y2 = y_in[..., self.M1:]

        psi = self.hyper_decoder(z_in, training)
        phi1 = self.context_model_1(y1)
        phi2 = self.context_model_2(y2)
        combined1 = jnp.concatenate([phi1, psi], axis=-1)
        combined2 = jnp.concatenate([phi2, psi], axis=-1)

        params = {}
        if self.K == 1:
            mu1, sigma1 = self.entropy_parameters_1(combined1)
            mu2, sigma2 = self.entropy_parameters_2(combined2)
            p_y1 = gaussian_likelihood(y1, mu1, sigma1)
            p_y2 = gaussian_likelihood(y2, mu2, sigma2)
            params = {"mu1": mu1, "sigma1": sigma1, "mu2": mu2, "sigma2": sigma2}
        else:
            weights1, mus1, sigmas1 = self.entropy_parameters_1(combined1)
            weights2, mus2, sigmas2 = self.entropy_parameters_2(combined2)
            p_y1 = mixture_likelihood(y1, weights1, mus1, sigmas1)
            p_y2 = mixture_likelihood(y2, weights2, mus2, sigmas2)
            params = {"weights1": weights1, "mus1": mus1, "sigmas1": sigmas1,
                      "weights2": weights2, "mus2": mus2, "sigmas2": sigmas2}

        p_z = self.factorized_entropy_model(z_in)

        x_hat = self.decoder(y_in, training).astype(jnp.float32)
        f_tilde = self.LST(y1, training).astype(jnp.float32)

        out = {
            "x_hat": x_hat,
            "y": y,
            "y_in": y_in,
            "y1": y1,
            "y2": y2,
            "z": z,
            "z_in": z_in,
            "p_z": p_z,
            "logp_z": jnp.log(p_z),
            "p_y1": p_y1,
            "logp_y1": jnp.log(p_y1),
            "p_y2": p_y2,
            "logp_y2": jnp.log(p_y2),
            "F_tilde": f_tilde,
            "training": training,
        }
        out.update(params)
        return out
