"""Checkerboard-context hierarchical model — two-pass parallel decoding.

The reference's only context model is the serial PixelCNN masked conv
(ContextModels.py:3-36): decode must visit latent pixels in raster/wavefront
order, so decoding is an inherently sequential HOST loop (our codec profile:
the AR stage is ~75% of end-to-end decode time, 400x the TPU work). This
module adds the checkerboard alternative (He et al., CVPR 2021,
"Checkerboard Context Model for Efficient Learned Image Compression"): the
latent grid splits into ANCHORS ((i+j) even) coded from the hyperprior alone
and NON-ANCHORS coded from a conv over the already-decoded anchors. Decode
collapses to exactly TWO fully-parallel passes — each one big jitted TPU
program — instead of h+w serial waves on the host. RD cost vs the serial AR
model is small (~2-4% rate in the paper); decode latency drops by the whole
wavefront stage.

TPU-first notes:
  * The context conv is a PLAIN 5x5 conv over the anchor-masked latents —
    causality lives in the input/output masks (constants that XLA folds into
    the fused conv), not in kernel mutation or host-side scheduling.
  * One training forward = one conv + one entropy-parameters pass: the EP
    net is pointwise (1x1 convs), so masking its context input reproduces
    both decode passes' parameters exactly, at every position, in a single
    program (tests/test_checkerboard.py asserts the two-pass equivalence).
  * Forward contract (keys/shapes) is identical to
    JointAutoregressiveHierarchical (Models.py:92-105 parity), so the
    Trainer, losses, evaluator, serving export and parallel eval all run
    unchanged.
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
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
from neural_image_compression_tpu.ops.conv import Conv2d

__all__ = ["CheckerboardHierarchical", "CheckerboardContext",
           "checkerboard_mask", "CB_CTX_POSITIONS"]

# The 12 live taps of the 5x5 context conv at a NON-ANCHOR center, in kernel
# coordinates (center = (2, 2)): exactly the taps with (r + c) odd — those
# land on anchor cells; the even-parity taps read the zeroed non-anchors and
# contribute nothing. Canonical gather order for the portable integer coder:
# coding/portable.py (_cb_gather, card build) and rans/ar_portable.cc
# (kCbTaps) both follow this row-major enumeration.
CB_CTX_POSITIONS = tuple((r, c) for r in range(5) for c in range(5)
                         if (r + c) % 2 == 1)
assert len(CB_CTX_POSITIONS) == 12

_TRANSFORMS = {
    "conv5x5": (Encoder5x5, Decoder5x5, HyperEncoder5x5, HyperDecoder5x5),
    "res3x3": (Encoder3x3, Decoder3x3, HyperEncoder3x3, HyperDecoder3x3),
}


def checkerboard_mask(h: int, w: int) -> np.ndarray:
    """(h, w) bool — True at ANCHOR positions ((i+j) even).

    The single source of truth for the anchor convention: the model's
    forward, both codec passes, and the bitstream symbol order all derive
    from this function.
    """
    ii = np.arange(h)[:, None]
    jj = np.arange(w)[None, :]
    return ((ii + jj) % 2) == 0


def _anchor_mask_f(h: int, w: int, dtype) -> jax.Array:
    """(1, h, w, 1) float mask, 1.0 at anchors — the jit-constant form."""
    return jnp.asarray(checkerboard_mask(h, w), dtype)[None, :, :, None]


class CheckerboardContext(nn.Module):
    """Plain 5x5 conv, M -> 2M, over the anchor-masked latents.

    No kernel mask is needed: the input carries only anchors, so at a
    non-anchor output position every live tap IS an anchor (zeros elsewhere
    contribute nothing), and the caller zeroes the output at anchor
    positions. Keeping the kernel dense lets XLA lower it as one ordinary
    MXU conv.
    """

    latent_channels: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, y_anchor: jax.Array) -> jax.Array:
        return Conv2d(2 * self.latent_channels, 5, padding=2,
                      dtype=self.dtype)(y_anchor)


class CheckerboardHierarchical(nn.Module):
    """Hyperprior + checkerboard context model.

    latent_channels: M (hyper channels == M, matching the joint-AR family).
    K: 1 -> mean-scale Gaussian; K > 1 -> K-component Gaussian mixture.
    transform: 'conv5x5' or 'res3x3' (same transform families as
    JointAutoregressiveHierarchical).
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
        self.context_model = CheckerboardContext(latent_channels=m,
                                                 dtype=self.dtype)
        self.entropy_parameters = EntropyParameters(
            latent_channels=m, hyper_latent_channels=m, K=self.K,
            dtype=self.dtype)

    @property
    def distribution(self) -> str:
        return "Mean-Scale Gaussian" if self.K == 1 else "Mixture of Gaussians"

    # -- the two decode passes (also composed by the training forward) -----
    def anchor_pass(self, z_q: jax.Array):
        """Pass 1: (psi, entropy params) from the hyperprior ALONE.

        The params are valid at anchor positions (their context is defined
        to be zero); the codec reads only those. psi is returned so pass 2
        reuses it without recomputing the hyper-decoder.
        """
        psi = self.hyper_decoder(z_q)
        ctx0 = jnp.zeros(psi.shape[:3] + (2 * self.latent_channels,),
                         psi.dtype)
        return (psi,) + tuple(self.entropy_parameters(
            jnp.concatenate([ctx0, psi], axis=-1)))

    def nonanchor_pass(self, psi: jax.Array, y_anchor: jax.Array):
        """Pass 2: entropy params from psi + conv over the decoded anchors.

        y_anchor: the latent grid with anchor values filled in and ZEROS at
        non-anchor positions. The params are valid at non-anchor positions.
        """
        am = _anchor_mask_f(y_anchor.shape[1], y_anchor.shape[2],
                            y_anchor.dtype)
        ctx = self.context_model(y_anchor)
        ctx = ctx * (1.0 - am).astype(ctx.dtype)
        return tuple(self.entropy_parameters(
            jnp.concatenate([ctx, psi], axis=-1)))

    def entropy_params_from_latents(self, y_in: jax.Array, z_in: jax.Array,
                                    training: bool = False):
        """One-pass training/eval form: context from anchors only, zeroed at
        anchor positions. Pointwise-equal to anchor_pass at anchors and to
        nonanchor_pass at non-anchors (EP is 1x1 convs)."""
        psi = self.hyper_decoder(z_in, training)
        am = _anchor_mask_f(y_in.shape[1], y_in.shape[2], y_in.dtype)
        ctx = self.context_model(y_in * am)
        ctx = ctx * (1.0 - am).astype(ctx.dtype)
        return self.entropy_parameters(jnp.concatenate([ctx, psi], axis=-1))

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
        x_hat = self.decoder(y_in, training).astype(jnp.float32)

        out = {
            "x_hat": x_hat, "y": y, "y_in": y_in, "z": z, "z_in": z_in,
            "p_z": p_z, "logp_z": jnp.log(p_z),
            "p_y": p_y, "logp_y": jnp.log(p_y),
            "training": training,
        }
        out.update(params)
        return out
