"""Joint autoregressive + hierarchical-prior models (Minnen et al. 2018).

Capability parity with Models.py:
  * JointAutoregressiveHierarchical (Models.py:10-106): 5x5 conv/GDN
    transforms + factorized hyper-bottleneck + masked-conv context + entropy
    parameters -> mean-scale Gaussian (K=1) or K-component Gaussian mixture.
  * HierarchicalMixtureResidual (Models.py:109-205): identical forward with
    3x3 residual-block transforms.

Both share one implementation here, selected by `transform`.

Forward contract matches the reference (Models.py:92-105): a dict with keys
x_hat, y, y_in, z, z_in, p_z, logp_z, p_y, logp_y, training, plus the entropy
parameters (mu/sigma for K=1; weights/mus/sigmas for K>1). Arrays are NHWC
(mixture params (B,H,W,K,M)) — the TPU-native layout.

Quantization (Models.py:55-66): training uses additive U(-0.5, 0.5) noise on
BOTH y and z drawn from the 'noise' PRNG stream; eval uses round(x) (plain
rounding, not mean-centered — matching the reference). Decoder and context
model consume the same y_in.
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from neural_image_compression_tpu.entropy.factorized import FactorizedEntropyBottleneck
from neural_image_compression_tpu.entropy.gaussian import gaussian_likelihood, mixture_likelihood
from neural_image_compression_tpu.models.components import (
    Decoder3x3, Decoder5x5, Encoder3x3, Encoder5x5,
    HyperDecoder3x3, HyperDecoder5x5, HyperEncoder3x3, HyperEncoder5x5,
)
from neural_image_compression_tpu.models.parameters import EntropyParameters
from neural_image_compression_tpu.ops.masked_conv import ContextModel

_TRANSFORMS = {
    "conv5x5": (Encoder5x5, Decoder5x5, HyperEncoder5x5, HyperDecoder5x5),
    "res3x3": (Encoder3x3, Decoder3x3, HyperEncoder3x3, HyperDecoder3x3),
}


def noise_quantize(x: jax.Array, rng: jax.Array) -> jax.Array:
    """Additive uniform-noise relaxation, U(-0.5, 0.5)."""
    return x + jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)


def round_quantize(x: jax.Array) -> jax.Array:
    return jnp.round(x)


def quantize(x: jax.Array, training: bool, rng: Optional[jax.Array]) -> jax.Array:
    if training:
        return noise_quantize(x, rng)
    return round_quantize(x)


class JointAutoregressiveHierarchical(nn.Module):
    """latent_channels: M (hyper channels H == M, Models.py:30).
    K: 1 -> mean-scale Gaussian; K > 1 -> Gaussian mixture.
    transform: 'conv5x5' (reference default) or 'res3x3' (residual variant).
    """

    latent_channels: int = 192
    K: int = 1
    transform: str = "conv5x5"
    dtype: Optional[Any] = None  # transform compute dtype (e.g. bf16); entropy math f32

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
        self.context_model = ContextModel(latent_channels=m, dtype=self.dtype)
        self.entropy_parameters = EntropyParameters(
            latent_channels=m, hyper_latent_channels=m, K=self.K, dtype=self.dtype)

    @property
    def distribution(self) -> str:
        return "Mean-Scale Gaussian" if self.K == 1 else "Mixture of Gaussians"

    def entropy_params_from_latents(self, y_in: jax.Array, z_in: jax.Array,
                                    training: bool = False):
        """psi = hyperdec(z_in), phi = context(y_in) -> conditional params.

        Exposed separately so the real codec can reuse it (encode side) and so
        the wavefront decoder can call hyper/context pieces independently.
        (`training` only steers the deconv lowering choice — the math is
        identical either way.)
        """
        psi = self.hyper_decoder(z_in, training)
        phi = self.context_model(y_in)
        combined = jnp.concatenate([phi, psi], axis=-1)
        return self.entropy_parameters(combined)

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

        params_t = self.entropy_params_from_latents(y_in, z_in, training)
        if self.K == 1:
            mu, sigma = params_t
            params = {"mu": mu, "sigma": sigma}
            p_y = gaussian_likelihood(y_in, mu, sigma)
        else:
            weights, mus, sigmas = params_t
            params = {"weights": weights, "mus": mus, "sigmas": sigmas}
            p_y = mixture_likelihood(y_in, weights, mus, sigmas)

        p_z = self.factorized_entropy_model(z_in)
        logp_z = jnp.log(p_z)
        logp_y = jnp.log(p_y)

        x_hat = self.decoder(y_in, training).astype(jnp.float32)

        out = {
            "x_hat": x_hat,
            "y": y,
            "y_in": y_in,
            "z": z,
            "z_in": z_in,
            "p_z": p_z,
            "logp_z": logp_z,
            "p_y": p_y,
            "logp_y": logp_y,
            "training": training,
        }
        out.update(params)
        return out


def HierarchicalMixtureResidual(latent_channels: int = 192, K: int = 1,
                                dtype=None) -> JointAutoregressiveHierarchical:
    """Residual-block variant (Models.py:109-205) — same forward, 3x3 transforms."""
    return JointAutoregressiveHierarchical(
        latent_channels=latent_channels, K=K, transform="res3x3", dtype=dtype)
