"""Channel-conditional + checkerboard context model ("ELIC-style" SCCTX) —
parallel decoding in 2·G device passes.

The reference's context ladder tops out at the serial PixelCNN masked conv
(ContextModels.py:3-36). `CheckerboardHierarchical` (models/checkerboard.py)
replaced the serial host loop with TWO parallel passes; this module adds the
modern space-channel context model (He et al., CVPR 2022, "ELIC: Efficient
Learned Image Compression with Unevenly Grouped Space-Channel Contextual
Adaptive Coding"): the latent channels split into G UNEVEN groups (the
paper's 1/8, 1/8, 1/4, 1/2 prefix — early groups small, so most channels
see rich context), coded group-by-group; within each group, positions split
into checkerboard anchors/non-anchors. Entropy parameters for group i come
from
    * psi — the hyper-decoder features (everything, always),
    * channel context — a conv stack over ALL previously decoded groups
      (no causality constraint: those groups are fully decoded everywhere,
      so any conv is legal; XLA lowers it as plain fused MXU convs),
    * spatial context — a 5x5 conv over the anchor-masked group itself
      (zero at anchors, live at non-anchors; same single-conv trick as
      models/checkerboard.py).

Decode is 2·G fully-parallel jitted passes (G = 4 -> 8 passes) instead of
h + w serial waves — the checkerboard family's latency shape with the
channel-AR family's rate (ELIC reports the uneven-group SCCTX beating the
serial joint-AR model). Training/eval is ONE program: the group loop
unrolls (static G), every pass is a conv/GEMM, and the forward contract
(keys/shapes) matches JointAutoregressiveHierarchical so the Trainer,
losses, evaluator, serving export and parallel eval run unchanged.
"""

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from neural_image_compression_tpu.entropy.factorized import FactorizedEntropyBottleneck
from neural_image_compression_tpu.entropy.gaussian import (
    gaussian_likelihood, mixture_likelihood,
)
from neural_image_compression_tpu.models.checkerboard import (
    _TRANSFORMS, _anchor_mask_f,
)
from neural_image_compression_tpu.models.joint_ar import (
    noise_quantize, round_quantize,
)
from neural_image_compression_tpu.models.parameters import EntropyParameters
from neural_image_compression_tpu.ops.blocks import leaky_relu
from neural_image_compression_tpu.ops.conv import Conv2d

__all__ = ["ChannelCheckerboardHierarchical", "default_groups"]


def default_groups(m: int) -> Tuple[int, ...]:
    """ELIC's uneven split, scaled to M: (M/8, M/8, M/4, M/2).

    Early groups are deliberately small — their symbols see the least
    context, and every later channel conditions on them. For M not
    divisible by 8 the remainder joins the last (largest) group; tiny M
    degenerates gracefully (zeros dropped, M < 4 -> one group == plain
    checkerboard).
    """
    if m < 1:
        raise ValueError(f"latent_channels must be >= 1, got {m}")
    g = (m // 8, m // 8, m // 4, m - 2 * (m // 8) - m // 4)
    groups = tuple(v for v in g if v > 0)
    return groups if groups else (m,)


class _ChannelContext(nn.Module):
    """Conv stack over the already-decoded groups: cin -> hidden -> 2g.

    5x5 receptive field per layer; decoded groups carry no causality
    constraint, so the kernels stay dense and XLA fuses the stack.
    """

    out_channels: int          # 2 * g_i
    hidden: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, y_prev: jax.Array) -> jax.Array:
        h = Conv2d(self.hidden, 5, padding=2, dtype=self.dtype)(y_prev)
        h = leaky_relu(h)
        return Conv2d(self.out_channels, 5, padding=2, dtype=self.dtype)(h)


def grouped_entropy_params(groups, spatial_ctx, channel_ctx,
                           entropy_parameters, y_in: jax.Array,
                           psi: jax.Array):
    """The one-program (training/eval) form of the 2·G decode passes, shared
    by the fixed-rate and gained variants: for each group (static unroll),
    channel context from the full previous groups, spatial context from the
    group's anchor-masked grid zeroed at anchors — pointwise-equal to the
    anchor pass at anchors and the non-anchor pass at non-anchors (the EP
    net is 1x1 convs). Returns params concatenated back to M channels (group
    order == channel order) for both the K=1 and K>1 layouts."""
    am = _anchor_mask_f(y_in.shape[1], y_in.shape[2], y_in.dtype)
    outs = []
    off = 0
    for i, gi in enumerate(groups):
        y_i = y_in[..., off:off + gi]
        ch = (channel_ctx[i](y_in[..., :off]) if i > 0
              else jnp.zeros(psi.shape[:3] + (2 * gi,), psi.dtype))
        sp = spatial_ctx[i](y_i * am)
        sp = sp * (1.0 - am).astype(sp.dtype)
        outs.append(entropy_parameters[i](
            jnp.concatenate([sp, ch, psi], axis=-1)))
        off += gi
    return tuple(jnp.concatenate(parts, axis=-1) for parts in zip(*outs))


class ChannelCheckerboardHierarchical(nn.Module):
    """Hyperprior + unevenly-grouped space-channel (checkerboard) context.

    latent_channels: M (hyper channels == M, matching the other families).
    K: 1 -> mean-scale Gaussian; K > 1 -> K-component Gaussian mixture.
    groups: uneven channel split (must sum to M); None -> default_groups(M).
    transform: 'conv5x5' or 'res3x3'.
    """

    latent_channels: int = 192
    K: int = 1
    groups: Optional[Tuple[int, ...]] = None
    transform: str = "conv5x5"
    ep_hidden: int = 640
    dtype: Optional[Any] = None  # transform compute dtype; entropy math f32

    def setup(self):
        if self.latent_channels < 1:
            raise ValueError(
                f"latent_channels must be >= 1, got {self.latent_channels}")
        if self.K < 1:
            raise ValueError(f"K must be >= 1, got {self.K}")
        g = (tuple(self.groups) if self.groups is not None
             else default_groups(self.latent_channels))
        if any(v < 1 for v in g) or sum(g) != self.latent_channels:
            raise ValueError(
                f"groups must be positive and sum to latent_channels="
                f"{self.latent_channels}, got {g}")
        self._groups = g
        enc, dec, henc, hdec = _TRANSFORMS[self.transform]
        m = self.latent_channels
        self.encoder = enc(latent_channels=m, dtype=self.dtype)
        self.decoder = dec(latent_channels=m, dtype=self.dtype)
        self.hyper_encoder = henc(latent_channels=m, dtype=self.dtype)
        self.hyper_decoder = hdec(latent_channels=m, dtype=self.dtype)
        self.factorized_entropy_model = FactorizedEntropyBottleneck(channels=m)
        # Per-group nets (group 0 has no channel context).
        sp, ch, ep = [], [], []
        for i, gi in enumerate(g):
            sp.append(Conv2d(2 * gi, 5, padding=2, dtype=self.dtype,
                             name=f"spatial_ctx_{i}"))
            ch.append(_ChannelContext(out_channels=2 * gi,
                                      hidden=max(2 * gi, 64),
                                      dtype=self.dtype,
                                      name=f"channel_ctx_{i}")
                      if i > 0 else None)
            # EP input: sp(2g) + ch(2g, zeros for group 0) + psi(2M) lanes.
            ep.append(EntropyParameters(
                latent_channels=gi, hyper_latent_channels=m, K=self.K,
                hidden=self.ep_hidden, dtype=self.dtype,
                input_channels=4 * gi + 2 * m, name=f"entropy_parameters_{i}"))
        self.spatial_ctx = sp
        self.channel_ctx = ch
        self.entropy_parameters = ep

    @property
    def group_sizes(self) -> Tuple[int, ...]:
        return self._groups

    @property
    def distribution(self) -> str:
        return "Mean-Scale Gaussian" if self.K == 1 else "Mixture of Gaussians"

    # -- per-group decode passes (composed by the training forward) --------
    def hyper_features(self, z_q: jax.Array, training: bool = False):
        return self.hyper_decoder(z_q, training)

    def group_channel_ctx(self, i: int, y_prev: Optional[jax.Array]):
        """Channel context for group i from the decoded groups < i
        ((B,H,W,sum(g[:i])) concat), or None for group 0. Computed ONCE per
        group — both checkerboard passes of the group reuse it."""
        if i == 0:
            return None
        return self.channel_ctx[i](y_prev)

    def group_params(self, i: int, psi: jax.Array, ch_ctx: Optional[jax.Array],
                     y_anchor_i: Optional[jax.Array]):
        """Entropy params for group i.

        y_anchor_i None -> anchor pass (spatial context defined zero; params
        valid at anchor positions). Otherwise y_anchor_i is the group's grid
        with decoded anchors and ZEROS at non-anchors -> non-anchor pass
        (params valid at non-anchor positions).
        """
        gi = self._groups[i]
        if y_anchor_i is None:
            sp = jnp.zeros(psi.shape[:3] + (2 * gi,), psi.dtype)
        else:
            am = _anchor_mask_f(y_anchor_i.shape[1], y_anchor_i.shape[2],
                                y_anchor_i.dtype)
            sp = self.spatial_ctx[i](y_anchor_i)
            sp = sp * (1.0 - am).astype(sp.dtype)
        if ch_ctx is None:
            ch_ctx = jnp.zeros(psi.shape[:3] + (2 * gi,), psi.dtype)
        return self.entropy_parameters[i](
            jnp.concatenate([sp, ch_ctx, psi], axis=-1))

    def entropy_params_from_latents(self, y_in: jax.Array, z_in: jax.Array,
                                    training: bool = False):
        """One-program training/eval form. For each group (static unroll):
        channel context from the full previous groups, spatial context from
        the group's anchor-masked grid, zeroed at anchors — pointwise-equal
        to the anchor pass at anchors and the non-anchor pass at non-anchors
        (the EP net is 1x1 convs). Returns params concatenated back to M
        channels, in group order == channel order."""
        psi = self.hyper_decoder(z_in, training)
        return grouped_entropy_params(self._groups, self.spatial_ctx,
                                      self.channel_ctx,
                                      self.entropy_parameters, y_in, psi)

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
