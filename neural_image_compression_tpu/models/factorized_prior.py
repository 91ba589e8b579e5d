"""Factorized-prior model (Ballé et al. 2017/2018, no hyperprior).

The reference has no standalone factorized-prior assembly, but BASELINE.json
names it as a benchmark config ("factorized-prior baseline (no hyperprior):
fully-parallel encode/decode across a λ grid") and it is the strict subset
slice of the pipeline: encoder -> factorized bottleneck on y -> decoder.
Output dict uses the same key contract so the loss/trainer/evaluator work
unchanged; the z-side keys alias tiny zero-rate placeholders so rd_loss's
bpp split stays well-defined.
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from neural_image_compression_tpu.entropy.factorized import FactorizedEntropyBottleneck
from neural_image_compression_tpu.models.components import (
    Decoder3x3, Decoder5x5, Encoder3x3, Encoder5x5,
)
from neural_image_compression_tpu.models.joint_ar import noise_quantize, round_quantize

_TRANSFORMS = {
    "conv5x5": (Encoder5x5, Decoder5x5),
    "res3x3": (Encoder3x3, Decoder3x3),
}


class FactorizedPrior(nn.Module):
    latent_channels: int = 192
    transform: str = "conv5x5"
    dtype: Optional[Any] = None

    def setup(self):
        enc, dec = _TRANSFORMS[self.transform]
        m = self.latent_channels
        self.encoder = enc(latent_channels=m, dtype=self.dtype)
        self.decoder = dec(latent_channels=m, dtype=self.dtype)
        self.factorized_entropy_model = FactorizedEntropyBottleneck(channels=m)

    def __call__(self, x: jax.Array, training: bool = True) -> Dict[str, jax.Array]:
        if x.shape[1] % 16 or x.shape[2] % 16:
            raise ValueError(
                f"H and W must be multiples of 16 (x16 transform), got "
                f"{x.shape[1]}x{x.shape[2]}; pad first (data.pad_to_multiple)")
        y = self.encoder(x)
        if training:
            y_in = noise_quantize(y.astype(jnp.float32), self.make_rng("noise"))
        else:
            y_in = round_quantize(y.astype(jnp.float32))

        p_y = self.factorized_entropy_model(y_in)
        logp_y = jnp.log(p_y)
        x_hat = self.decoder(y_in, training).astype(jnp.float32)

        # Zero-rate z placeholders keep the rd_loss bpp_y/bpp_z split valid.
        ones = jnp.ones((x.shape[0], 1, 1, 1), jnp.float32)
        return {
            "x_hat": x_hat,
            "y": y,
            "y_in": y_in,
            "z": jnp.zeros_like(ones),
            "z_in": jnp.zeros_like(ones),
            "p_y": p_y,
            "logp_y": logp_y,
            "p_z": ones,           # likelihood 1 -> logp 0 -> zero rate
            "logp_z": jnp.log(ones),
            "training": training,
        }
