"""Mean-scale hyperprior model — context-free, one-pass parallel decoding.

The reference ships only context-model assemblies (Models.py:10-106 wires the
masked-conv context into every hierarchical model). This adds the canonical
middle rung of the lineage those models extend — Ballé et al. 2018
("Variational image compression with a scale hyperprior") in the mean-scale
form of Minnen et al. 2018's context-free ablation: the hyper-decoder's psi
feeds the entropy-parameters net DIRECTLY, with no context model at all.

Why it earns its place in a TPU-native framework:
  * Decoding needs ONE fully-parallel device pass for all entropy parameters
    (vs two for the checkerboard family, vs h+w host wavefront steps for the
    joint-AR family) — the lowest-latency codec in the ladder.
  * Entropy parameters depend only on z, so they are computable BEFORE any
    y symbol is decoded: encode and decode have no feedback loop anywhere.
  * The EP net contracts over 2M input lanes (psi only) instead of the
    4M context+hyper concat — half the first-GEMM FLOPs of the joint family.

Family ladder (rate at matched PSNR decreases downward, decode parallelism
increases upward):
    FactorizedPrior < MeanScaleHyperprior < CheckerboardHierarchical
                    < JointAutoregressiveHierarchical

Forward contract, quantization, transforms, K=1/K>1 behavior all match the
other families (Models.py:92-105 key parity), so the Trainer, losses,
evaluator, serving export, and parallel paths run unchanged.
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from neural_image_compression_tpu.entropy.factorized import FactorizedEntropyBottleneck
from neural_image_compression_tpu.entropy.gaussian import (
    gaussian_likelihood, mixture_likelihood,
)
from neural_image_compression_tpu.models.components import (
    Decoder3x3, Decoder5x5, Encoder3x3, Encoder5x5,
    HyperDecoder3x3, HyperDecoder5x5, HyperEncoder3x3, HyperEncoder5x5,
)
from neural_image_compression_tpu.models.joint_ar import (
    noise_quantize, round_quantize,
)
from neural_image_compression_tpu.models.parameters import EntropyParameters

__all__ = ["MeanScaleHyperprior"]

_TRANSFORMS = {
    "conv5x5": (Encoder5x5, Decoder5x5, HyperEncoder5x5, HyperDecoder5x5),
    "res3x3": (Encoder3x3, Decoder3x3, HyperEncoder3x3, HyperDecoder3x3),
}


class MeanScaleHyperprior(nn.Module):
    """latent_channels: M (hyper channels == M, matching the other families).
    K: 1 -> mean-scale Gaussian; K > 1 -> K-component Gaussian mixture.
    transform: 'conv5x5' or 'res3x3'.
    """

    latent_channels: int = 192
    K: int = 1
    transform: str = "conv5x5"
    dtype: Optional[Any] = None  # transform compute dtype; entropy math f32

    def setup(self):
        if self.latent_channels < 1:
            raise ValueError(f"latent_channels must be >= 1, got {self.latent_channels}")
        if self.K < 1:
            raise ValueError(f"K must be >= 1, got {self.K}")
        enc, dec, henc, hdec = _TRANSFORMS[self.transform]
        m = self.latent_channels
        self.encoder = enc(latent_channels=m, dtype=self.dtype)
        self.decoder = dec(latent_channels=m, dtype=self.dtype)
        self.hyper_encoder = henc(latent_channels=m, dtype=self.dtype)
        self.hyper_decoder = hdec(latent_channels=m, dtype=self.dtype)
        self.factorized_entropy_model = FactorizedEntropyBottleneck(channels=m)
        self.entropy_parameters = EntropyParameters(
            latent_channels=m, hyper_latent_channels=m, K=self.K,
            input_channels=2 * m, dtype=self.dtype)

    @property
    def distribution(self) -> str:
        return "Mean-Scale Gaussian" if self.K == 1 else "Mixture of Gaussians"

    def entropy_params_from_hyper(self, z_in: jax.Array, training: bool = False):
        """All y entropy parameters from the hyperprior alone (the whole
        point of the family: no y feedback, one parallel pass). The codec
        uses this on both sides, so the f32 parameters are bit-identical at
        encode and decode (same jitted program, same integer z_q input)."""
        psi = self.hyper_decoder(z_in, training)
        return self.entropy_parameters(psi)

    def __call__(self, x: jax.Array, training: bool = True) -> Dict[str, jax.Array]:
        if x.shape[1] % 64 or x.shape[2] % 64:
            raise ValueError(
                f"H and W must be multiples of 64 (x16 transform + x4 hyper "
                f"downsampling), got {x.shape[1]}x{x.shape[2]}; pad first "
                f"(e.g. data.pad_to_multiple(x, 64)) and crop the output")
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

        params_t = self.entropy_params_from_hyper(z_in, training)
        if self.K == 1:
            mu, sigma = params_t
            params = {"mu": mu, "sigma": sigma}
            p_y = gaussian_likelihood(y_in, mu, sigma)
        else:
            weights, mus, sigmas = params_t
            params = {"weights": weights, "mus": mus, "sigmas": sigmas}
            p_y = mixture_likelihood(y_in, weights, mus, sigmas)

        p_z = self.factorized_entropy_model(z_in)
        x_hat = self.decoder(y_in, training).astype(jnp.float32)

        out = {
            "x_hat": x_hat, "y": y, "y_in": y_in, "z": z, "z_in": z_in,
            "p_z": p_z, "logp_z": jnp.log(p_z),
            "p_y": p_y, "logp_y": jnp.log(p_y),
            "training": training,
        }
        out.update(params)
        return out
