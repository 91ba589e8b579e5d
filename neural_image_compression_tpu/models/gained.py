"""Variable-rate ("gained") model families + exact gain folding.

Three variable-rate families: GainedJointAR (best rate, host wavefront
decode), GainedCheckerboard (two device passes), GainedHyperprior (one
device pass — the lowest-latency variable-rate codec). All fold to their
fixed-rate counterparts via the shared fold_gains.

The reference trains ONE model per rate point (Main.ipynb cell 6: a single
lambda per run; its eval artifact is one RD point). Production codecs need
one model serving the whole RD curve. This implements asymmetric gain units
(Cui et al., CVPR 2021, "Asymmetric Gained Deep Image Compression With
Continuous Rate Adaptation"): per-level channelwise gain vectors scale the
latents before quantization (and inverse-gain after), so a single set of
transform weights codes at N trained rate points — and at any rate in
between, via geometric interpolation of adjacent gain vectors.

TPU-first design decision — **gain folding**: for any fixed level (integer
or continuous), the four gain vectors fold EXACTLY into the weights of the
surrounding convolutions (encoder's final conv out-channels x g_y; decoder's
first deconv in-channels x 1/ig_y... see fold_gains), yielding a plain
JointAutoregressiveHierarchical parameter tree. Everything downstream —
the real bitstream codec, serving export, the evaluator, parallel eval —
consumes the folded model with ZERO changes, and the folded forward is the
same XLA program as the fixed-rate flagship (no per-level gather in the hot
path). The gained forward here is for training and quick multi-rate eval.

Only the conv5x5 transform family is supported: folding needs pure convs at
all four latent boundaries (the res3x3 decoder opens with an identity-skip
residual block, where a channel scale cannot fold).

Training: `parallel.make_train_step(..., levels=model.levels)` samples a
level uniformly per step and weights the loss with that level's lambda
(the Trainer wires this automatically for models with a `levels` field).
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from neural_image_compression_tpu.entropy.factorized import FactorizedEntropyBottleneck
from neural_image_compression_tpu.entropy.gaussian import (
    gaussian_likelihood, mixture_likelihood,
)
from neural_image_compression_tpu.models.components import (
    Decoder5x5, Encoder5x5, HyperDecoder5x5, HyperEncoder5x5,
)
from neural_image_compression_tpu.models.checkerboard import (
    CheckerboardContext, CheckerboardHierarchical, _anchor_mask_f,
)
from neural_image_compression_tpu.models.channel_cb import (
    ChannelCheckerboardHierarchical, _ChannelContext, default_groups,
    grouped_entropy_params,
)
from neural_image_compression_tpu.models.hyperprior import MeanScaleHyperprior
from neural_image_compression_tpu.models.joint_ar import (
    JointAutoregressiveHierarchical, noise_quantize, round_quantize,
)
from neural_image_compression_tpu.models.parameters import EntropyParameters
from neural_image_compression_tpu.ops.masked_conv import ContextModel

__all__ = ["GainedJointAR", "GainedHyperprior", "GainedCheckerboard",
           "GainedChannelCheckerboard",
           "fold_gains", "folded_model", "interp_gain", "level_for_bpp"]

_GAIN_KEYS = ("gain_y", "igain_y", "gain_z", "igain_z")


def interp_gain(table: jax.Array, level) -> jax.Array:
    """Gain vector at `level` from an (N, C) per-level table.

    Integer levels select a row; fractional levels geometrically interpolate
    the two adjacent rows (rates vary ~exponentially in the gain, so the
    log-domain lerp gives smooth bpp control — Cui et al. sec. 3.3).
    Gains are kept positive via |.| (sign is redundant: y*g and the
    predicted distribution live in the same scaled domain).
    """
    n = table.shape[0]
    lv = jnp.clip(jnp.asarray(level, jnp.float32), 0, n - 1)
    lo = jnp.floor(lv).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n - 1)
    t = lv - lo.astype(jnp.float32)
    g = jnp.log(jnp.abs(table) + 1e-12)
    return jnp.exp((1.0 - t) * g[lo] + t * g[hi])


class GainedJointAR(nn.Module):
    """JointAutoregressiveHierarchical + per-level gain units.

    levels: ascending rate-distortion weights; level i trains gain vectors
    for lambda = levels[i] (higher lambda -> larger gains -> finer
    quantization -> more bits). `__call__(x, training, level)` accepts an
    integer level, a float (continuous interpolation), or a traced scalar
    (the train step samples it per batch).
    """

    latent_channels: int = 192
    K: int = 1
    levels: Tuple[float, ...] = (0.0015, 0.0035, 0.0075, 0.015, 0.03)
    dtype: Optional[Any] = None

    def setup(self):
        _validate_gained(self)
        m = self.latent_channels
        n = len(self.levels)
        self.encoder = Encoder5x5(latent_channels=m, dtype=self.dtype)
        self.decoder = Decoder5x5(latent_channels=m, dtype=self.dtype)
        self.hyper_encoder = HyperEncoder5x5(latent_channels=m, dtype=self.dtype)
        self.hyper_decoder = HyperDecoder5x5(latent_channels=m, dtype=self.dtype)
        self.factorized_entropy_model = FactorizedEntropyBottleneck(channels=m)
        self.context_model = ContextModel(latent_channels=m, dtype=self.dtype)
        self.entropy_parameters = EntropyParameters(
            latent_channels=m, hyper_latent_channels=m, K=self.K, dtype=self.dtype)
        init = nn.initializers.ones
        self.gain_y = self.param("gain_y", init, (n, m))
        self.igain_y = self.param("igain_y", init, (n, m))
        self.gain_z = self.param("gain_z", init, (n, m))
        self.igain_z = self.param("igain_z", init, (n, m))

    def gain_vectors(self, level):
        """(g_y, ig_y, g_z, ig_z) at `level` — the single source of truth
        shared with fold_gains (so folding is exact by construction)."""
        return tuple(interp_gain(t, level) for t in
                     (self.gain_y, self.igain_y, self.gain_z, self.igain_z))

    def __call__(self, x: jax.Array, training: bool = True,
                 level=0) -> Dict[str, jax.Array]:
        if x.shape[1] % 64 or x.shape[2] % 64:
            raise ValueError(
                f"H and W must be multiples of 64, got {x.shape[1]}x{x.shape[2]}; "
                "pad first (data.pad_to_multiple) and crop the output")
        g_y, ig_y, g_z, ig_z = self.gain_vectors(level)

        y = self.encoder(x)
        y = y * g_y.astype(y.dtype)          # gained domain: what gets coded
        z = self.hyper_encoder(y)
        z = z * g_z.astype(z.dtype)

        if training:
            rng = self.make_rng("noise")
            rng_z, rng_y = jax.random.split(rng)
            z_in = noise_quantize(z.astype(jnp.float32), rng_z)
            y_in = noise_quantize(y.astype(jnp.float32), rng_y)
        else:
            z_in = round_quantize(z.astype(jnp.float32))
            y_in = round_quantize(y.astype(jnp.float32))

        # inverse gains sit in front of the decoders only; the context model
        # and both entropy models operate in the gained (coded) domain
        psi = self.hyper_decoder(z_in * ig_z, training)
        phi = self.context_model(y_in)
        combined = jnp.concatenate([phi, psi], axis=-1)
        params_t = self.entropy_parameters(combined)
        if self.K == 1:
            mu, sigma = params_t
            params = {"mu": mu, "sigma": sigma}
            p_y = gaussian_likelihood(y_in, mu, sigma)
        else:
            weights, mus, sigmas = params_t
            params = {"weights": weights, "mus": mus, "sigmas": sigmas}
            p_y = mixture_likelihood(y_in, weights, mus, sigmas)

        p_z = self.factorized_entropy_model(z_in)
        x_hat = self.decoder(y_in * ig_y, training).astype(jnp.float32)

        out = {
            "x_hat": x_hat, "y": y, "y_in": y_in, "z": z, "z_in": z_in,
            "p_z": p_z, "logp_z": jnp.log(p_z),
            "p_y": p_y, "logp_y": jnp.log(p_y),
            "training": training,
        }
        out.update(params)
        return out


def _validate_gained(mdl) -> None:
    """Shared constructor validation for the gained families."""
    if mdl.latent_channels < 1:
        raise ValueError(
            f"latent_channels must be >= 1, got {mdl.latent_channels}")
    if mdl.K < 1:
        raise ValueError(f"K must be >= 1, got {mdl.K}")
    if len(mdl.levels) < 2:
        raise ValueError("levels needs >= 2 rate points")
    if list(mdl.levels) != sorted(mdl.levels):
        raise ValueError(f"levels must be ascending, got {mdl.levels}")


class GainedHyperprior(nn.Module):
    """MeanScaleHyperprior + per-level gain units (see GainedJointAR).

    The variable-rate form of the context-free family: one model serves the
    whole RD curve AND decodes with a single parallel device pass — the
    lowest-latency variable-rate codec in the ladder. fold_gains at any
    level yields a plain MeanScaleHyperprior tree that runs the existing
    MeanScaleHyperpriorCodec / serving export / evaluator unchanged.
    conv5x5 only (folding needs pure convs at the latent boundaries).
    """

    latent_channels: int = 192
    K: int = 1
    levels: Tuple[float, ...] = (0.0015, 0.0035, 0.0075, 0.015, 0.03)
    dtype: Optional[Any] = None

    def setup(self):
        _validate_gained(self)
        m, n = self.latent_channels, len(self.levels)
        self.encoder = Encoder5x5(latent_channels=m, dtype=self.dtype)
        self.decoder = Decoder5x5(latent_channels=m, dtype=self.dtype)
        self.hyper_encoder = HyperEncoder5x5(latent_channels=m, dtype=self.dtype)
        self.hyper_decoder = HyperDecoder5x5(latent_channels=m, dtype=self.dtype)
        self.factorized_entropy_model = FactorizedEntropyBottleneck(channels=m)
        self.entropy_parameters = EntropyParameters(
            latent_channels=m, hyper_latent_channels=m, K=self.K,
            input_channels=2 * m, dtype=self.dtype)
        init = nn.initializers.ones
        self.gain_y = self.param("gain_y", init, (n, m))
        self.igain_y = self.param("igain_y", init, (n, m))
        self.gain_z = self.param("gain_z", init, (n, m))
        self.igain_z = self.param("igain_z", init, (n, m))

    def gain_vectors(self, level):
        return tuple(interp_gain(t, level) for t in
                     (self.gain_y, self.igain_y, self.gain_z, self.igain_z))

    def __call__(self, x: jax.Array, training: bool = True,
                 level=0) -> Dict[str, jax.Array]:
        if x.shape[1] % 64 or x.shape[2] % 64:
            raise ValueError(
                f"H and W must be multiples of 64, got {x.shape[1]}x{x.shape[2]}; "
                "pad first (data.pad_to_multiple) and crop the output")
        g_y, ig_y, g_z, ig_z = self.gain_vectors(level)

        y = self.encoder(x)
        y = y * g_y.astype(y.dtype)
        z = self.hyper_encoder(y)
        z = z * g_z.astype(z.dtype)

        if training:
            rng = self.make_rng("noise")
            rng_z, rng_y = jax.random.split(rng)
            z_in = noise_quantize(z.astype(jnp.float32), rng_z)
            y_in = noise_quantize(y.astype(jnp.float32), rng_y)
        else:
            z_in = round_quantize(z.astype(jnp.float32))
            y_in = round_quantize(y.astype(jnp.float32))

        psi = self.hyper_decoder(z_in * ig_z, training)
        params_t = self.entropy_parameters(psi)
        if self.K == 1:
            mu, sigma = params_t
            params = {"mu": mu, "sigma": sigma}
            p_y = gaussian_likelihood(y_in, mu, sigma)
        else:
            weights, mus, sigmas = params_t
            params = {"weights": weights, "mus": mus, "sigmas": sigmas}
            p_y = mixture_likelihood(y_in, weights, mus, sigmas)

        p_z = self.factorized_entropy_model(z_in)
        x_hat = self.decoder(y_in * ig_y, training).astype(jnp.float32)

        out = {
            "x_hat": x_hat, "y": y, "y_in": y_in, "z": z, "z_in": z_in,
            "p_z": p_z, "logp_z": jnp.log(p_z),
            "p_y": p_y, "logp_y": jnp.log(p_y),
            "training": training,
        }
        out.update(params)
        return out


class GainedCheckerboard(nn.Module):
    """CheckerboardHierarchical + per-level gain units (see GainedJointAR).

    Variable-rate two-device-pass decoding: fold_gains at any level yields a
    plain CheckerboardHierarchical tree for the existing CheckerboardCodec.
    The checkerboard context conv operates in the gained (coded) domain, so
    it is copied untouched by the fold — exactly like the joint family's
    masked conv. conv5x5 only.
    """

    latent_channels: int = 192
    K: int = 1
    levels: Tuple[float, ...] = (0.0015, 0.0035, 0.0075, 0.015, 0.03)
    dtype: Optional[Any] = None

    def setup(self):
        _validate_gained(self)
        m, n = self.latent_channels, len(self.levels)
        self.encoder = Encoder5x5(latent_channels=m, dtype=self.dtype)
        self.decoder = Decoder5x5(latent_channels=m, dtype=self.dtype)
        self.hyper_encoder = HyperEncoder5x5(latent_channels=m, dtype=self.dtype)
        self.hyper_decoder = HyperDecoder5x5(latent_channels=m, dtype=self.dtype)
        self.factorized_entropy_model = FactorizedEntropyBottleneck(channels=m)
        self.context_model = CheckerboardContext(latent_channels=m,
                                                 dtype=self.dtype)
        self.entropy_parameters = EntropyParameters(
            latent_channels=m, hyper_latent_channels=m, K=self.K,
            dtype=self.dtype)
        init = nn.initializers.ones
        self.gain_y = self.param("gain_y", init, (n, m))
        self.igain_y = self.param("igain_y", init, (n, m))
        self.gain_z = self.param("gain_z", init, (n, m))
        self.igain_z = self.param("igain_z", init, (n, m))

    def gain_vectors(self, level):
        return tuple(interp_gain(t, level) for t in
                     (self.gain_y, self.igain_y, self.gain_z, self.igain_z))

    def __call__(self, x: jax.Array, training: bool = True,
                 level=0) -> Dict[str, jax.Array]:
        if x.shape[1] % 64 or x.shape[2] % 64:
            raise ValueError(
                f"H and W must be multiples of 64, got {x.shape[1]}x{x.shape[2]}; "
                "pad first (data.pad_to_multiple) and crop the output")
        g_y, ig_y, g_z, ig_z = self.gain_vectors(level)

        y = self.encoder(x)
        y = y * g_y.astype(y.dtype)
        z = self.hyper_encoder(y)
        z = z * g_z.astype(z.dtype)

        if training:
            rng = self.make_rng("noise")
            rng_z, rng_y = jax.random.split(rng)
            z_in = noise_quantize(z.astype(jnp.float32), rng_z)
            y_in = noise_quantize(y.astype(jnp.float32), rng_y)
        else:
            z_in = round_quantize(z.astype(jnp.float32))
            y_in = round_quantize(y.astype(jnp.float32))

        # one-pass form of the two checkerboard passes (cf.
        # CheckerboardHierarchical.entropy_params_from_latents), in the
        # gained domain: context from anchors only, zeroed at anchors
        psi = self.hyper_decoder(z_in * ig_z, training)
        am = _anchor_mask_f(y_in.shape[1], y_in.shape[2], y_in.dtype)
        ctx = self.context_model(y_in * am)
        ctx = ctx * (1.0 - am).astype(ctx.dtype)
        params_t = self.entropy_parameters(
            jnp.concatenate([ctx, psi], axis=-1))
        if self.K == 1:
            mu, sigma = params_t
            params = {"mu": mu, "sigma": sigma}
            p_y = gaussian_likelihood(y_in, mu, sigma)
        else:
            weights, mus, sigmas = params_t
            params = {"weights": weights, "mus": mus, "sigmas": sigmas}
            p_y = mixture_likelihood(y_in, weights, mus, sigmas)

        p_z = self.factorized_entropy_model(z_in)
        x_hat = self.decoder(y_in * ig_y, training).astype(jnp.float32)

        out = {
            "x_hat": x_hat, "y": y, "y_in": y_in, "z": z, "z_in": z_in,
            "p_z": p_z, "logp_z": jnp.log(p_z),
            "p_y": p_y, "logp_y": jnp.log(p_y),
            "training": training,
        }
        out.update(params)
        return out


class GainedChannelCheckerboard(nn.Module):
    """ChannelCheckerboardHierarchical + per-level gain units (see
    GainedJointAR): variable-rate with the 2·G-pass parallel decode.

    fold_gains at any level yields a plain ChannelCheckerboardHierarchical
    tree for the existing ChannelCheckerboardCodec — all per-group context
    and EP nets operate in the gained (coded) domain and are copied
    untouched by the fold, exactly like the other families' context nets.
    conv5x5 only.
    """

    latent_channels: int = 192
    K: int = 1
    groups: Optional[Tuple[int, ...]] = None
    levels: Tuple[float, ...] = (0.0015, 0.0035, 0.0075, 0.015, 0.03)
    dtype: Optional[Any] = None

    def setup(self):
        _validate_gained(self)
        m, n = self.latent_channels, len(self.levels)
        g = (tuple(self.groups) if self.groups is not None
             else default_groups(m))
        if any(v < 1 for v in g) or sum(g) != m:
            raise ValueError(f"groups must be positive and sum to "
                             f"latent_channels={m}, got {g}")
        self._groups = g
        self.encoder = Encoder5x5(latent_channels=m, dtype=self.dtype)
        self.decoder = Decoder5x5(latent_channels=m, dtype=self.dtype)
        self.hyper_encoder = HyperEncoder5x5(latent_channels=m,
                                             dtype=self.dtype)
        self.hyper_decoder = HyperDecoder5x5(latent_channels=m,
                                             dtype=self.dtype)
        self.factorized_entropy_model = FactorizedEntropyBottleneck(channels=m)
        from neural_image_compression_tpu.ops.conv import Conv2d
        sp, ch, ep = [], [], []
        for i, gi in enumerate(g):
            sp.append(Conv2d(2 * gi, 5, padding=2, dtype=self.dtype,
                             name=f"spatial_ctx_{i}"))
            ch.append(_ChannelContext(out_channels=2 * gi,
                                      hidden=max(2 * gi, 64),
                                      dtype=self.dtype,
                                      name=f"channel_ctx_{i}")
                      if i > 0 else None)
            ep.append(EntropyParameters(
                latent_channels=gi, hyper_latent_channels=m, K=self.K,
                dtype=self.dtype, input_channels=4 * gi + 2 * m,
                name=f"entropy_parameters_{i}"))
        self.spatial_ctx = sp
        self.channel_ctx = ch
        self.entropy_parameters = ep
        init = nn.initializers.ones
        self.gain_y = self.param("gain_y", init, (n, m))
        self.igain_y = self.param("igain_y", init, (n, m))
        self.gain_z = self.param("gain_z", init, (n, m))
        self.igain_z = self.param("igain_z", init, (n, m))

    def gain_vectors(self, level):
        return tuple(interp_gain(t, level) for t in
                     (self.gain_y, self.igain_y, self.gain_z, self.igain_z))

    def __call__(self, x: jax.Array, training: bool = True,
                 level=0) -> Dict[str, jax.Array]:
        if x.shape[1] % 64 or x.shape[2] % 64:
            raise ValueError(
                f"H and W must be multiples of 64, got {x.shape[1]}x{x.shape[2]}; "
                "pad first (data.pad_to_multiple) and crop the output")
        g_y, ig_y, g_z, ig_z = self.gain_vectors(level)

        y = self.encoder(x)
        y = y * g_y.astype(y.dtype)
        z = self.hyper_encoder(y)
        z = z * g_z.astype(z.dtype)

        if training:
            rng = self.make_rng("noise")
            rng_z, rng_y = jax.random.split(rng)
            z_in = noise_quantize(z.astype(jnp.float32), rng_z)
            y_in = noise_quantize(y.astype(jnp.float32), rng_y)
        else:
            z_in = round_quantize(z.astype(jnp.float32))
            y_in = round_quantize(y.astype(jnp.float32))

        # the one-program form of the 2G decode passes, in the gained domain
        psi = self.hyper_decoder(z_in * ig_z, training)
        params_t = grouped_entropy_params(self._groups, self.spatial_ctx,
                                          self.channel_ctx,
                                          self.entropy_parameters, y_in, psi)
        if self.K == 1:
            mu, sigma = params_t
            params = {"mu": mu, "sigma": sigma}
            p_y = gaussian_likelihood(y_in, mu, sigma)
        else:
            weights, mus, sigmas = params_t
            params = {"weights": weights, "mus": mus, "sigmas": sigmas}
            p_y = mixture_likelihood(y_in, weights, mus, sigmas)

        p_z = self.factorized_entropy_model(z_in)
        x_hat = self.decoder(y_in * ig_y, training).astype(jnp.float32)

        out = {
            "x_hat": x_hat, "y": y, "y_in": y_in, "z": z, "z_in": z_in,
            "p_z": p_z, "logp_z": jnp.log(p_z),
            "p_y": p_y, "logp_y": jnp.log(p_y),
            "training": training,
        }
        out.update(params)
        return out


def level_for_bpp(model, params, x, target_bpp: float,
                  tol: float = 0.01, max_iters: int = 16):
    """Rate control: the continuous level whose EVAL-forward analytic bpp on
    `x` best matches `target_bpp`. Returns (level, bpp_at_level). Works for
    every gained family (any model whose apply takes a `level` kwarg and
    that has a `levels` ladder).

    Bisection over the ladder's continuous range [0, N-1]: rate increases
    monotonically in level on a trained ladder (`levels` is the ascending
    lambda ladder — higher lambda trains larger gains, i.e. finer effective
    quantization, i.e. more bits). Each probe is ONE jitted eval forward;
    `level` is a traced argument, so every probe shares one executable.

    Out-of-range targets clamp to the nearest ladder edge and return that
    edge's bpp, so callers can check achievability:
        level, got = level_for_bpp(model, params, x, 0.25)
        stream = codec_at(level).compress(x)   # fold_gains(params, level)

    tol: relative bpp tolerance for early exit (the bisection also stops
    after max_iters, giving a level resolution of (N-1) / 2**max_iters).
    """
    x = jnp.asarray(x, jnp.float32)
    if x.ndim != 4:
        raise ValueError(f"x must be (B, H, W, 3), got shape {x.shape}")
    if target_bpp <= 0:
        raise ValueError(f"target_bpp must be positive, got {target_bpp}")
    num_pixels = x.shape[1] * x.shape[2]

    @jax.jit
    def probe(level):
        out = model.apply({"params": params}, x, training=False, level=level)
        bits = -(jnp.sum(out["logp_y"]) + jnp.sum(out["logp_z"])) / jnp.log(2.0)
        return bits / (x.shape[0] * num_pixels)

    n = len(model.levels)
    lo, hi = 0.0, float(n - 1)
    b_lo = float(probe(lo))
    b_hi = float(probe(hi))
    if target_bpp <= b_lo:
        return lo, b_lo
    if target_bpp >= b_hi:
        return hi, b_hi
    best = (lo, b_lo) if abs(b_lo - target_bpp) < abs(b_hi - target_bpp) \
        else (hi, b_hi)
    for _ in range(max_iters):
        mid = 0.5 * (lo + hi)
        b = float(probe(mid))
        if abs(b - target_bpp) < abs(best[1] - target_bpp):
            best = (mid, b)
        if abs(b - target_bpp) <= tol * target_bpp:
            break
        if b < target_bpp:
            lo = mid
        else:
            hi = mid
    return best


def folded_model(gained):
    """The fixed-rate model a folded param tree belongs to (per family)."""
    if isinstance(gained, GainedHyperprior):
        return MeanScaleHyperprior(
            latent_channels=gained.latent_channels, K=gained.K,
            transform="conv5x5", dtype=gained.dtype)
    if isinstance(gained, GainedCheckerboard):
        return CheckerboardHierarchical(
            latent_channels=gained.latent_channels, K=gained.K,
            transform="conv5x5", dtype=gained.dtype)
    if isinstance(gained, GainedChannelCheckerboard):
        return ChannelCheckerboardHierarchical(
            latent_channels=gained.latent_channels, K=gained.K,
            groups=gained.groups, transform="conv5x5", dtype=gained.dtype)
    if isinstance(gained, GainedJointAR):
        return JointAutoregressiveHierarchical(
            latent_channels=gained.latent_channels, K=gained.K,
            transform="conv5x5", dtype=gained.dtype)
    raise TypeError(f"not a gained model: {type(gained).__name__}")


def fold_gains(params, level) -> dict:
    """Fold a gained param tree (any family — the four boundary convolutions
    share names across GainedJointAR / GainedHyperprior / GainedCheckerboard)
    at `level` (int or fractional) into the matching fixed-rate tree
    (folded_model gives the module). Exact up to f32 association:
    the four gain vectors become channel scales on the boundary convolutions
    (sum(w_i*g*x_i) != g*sum(w_i*x_i) bit-for-bit, so a latent sitting on a
    round() tie can flip by one step between the gained and folded forwards;
    codec correctness is unaffected because encode and decode both use the
    folded params) —

      encoder/Conv2d_3      out-channels * g_y   (kernel AND bias: the conv
                                                  output IS y, so both scale)
      decoder/Deconv2d_0    in-channels  * ig_y  (y_in*ig feeds it linearly)
      hyper_encoder/Conv2d_2 out-channels * g_z
      hyper_decoder/Deconv2d_0 in-channels * ig_z

    The context model, entropy-parameters net and both entropy models
    operate in the gained domain and are copied untouched. The result runs
    everywhere a fixed-rate JointAR runs: real codec, serving export,
    evaluator, parallel eval.
    """
    for k in _GAIN_KEYS + ("encoder", "decoder", "hyper_encoder", "hyper_decoder"):
        if k not in params:
            raise ValueError(f"not a gained param tree: missing {k!r}")
    g_y = interp_gain(params["gain_y"], level)
    ig_y = interp_gain(params["igain_y"], level)
    g_z = interp_gain(params["gain_z"], level)
    ig_z = interp_gain(params["igain_z"], level)

    def scale_out(layer, g):
        return {"kernel": layer["kernel"] * g,          # (kh, kw, cin, COUT)
                "bias": layer["bias"] * g}

    def scale_in(layer, g):
        return {"kernel": layer["kernel"] * g[:, None],  # (kh, kw, CIN, cout)
                "bias": layer["bias"]}

    out = {k: v for k, v in params.items() if k not in _GAIN_KEYS}
    out["encoder"] = dict(params["encoder"])
    out["encoder"]["Conv2d_3"] = scale_out(params["encoder"]["Conv2d_3"], g_y)
    out["decoder"] = dict(params["decoder"])
    out["decoder"]["Deconv2d_0"] = scale_in(params["decoder"]["Deconv2d_0"], ig_y)
    out["hyper_encoder"] = dict(params["hyper_encoder"])
    out["hyper_encoder"]["Conv2d_2"] = scale_out(params["hyper_encoder"]["Conv2d_2"], g_z)
    out["hyper_decoder"] = dict(params["hyper_decoder"])
    out["hyper_decoder"]["Deconv2d_0"] = scale_in(params["hyper_decoder"]["Deconv2d_0"], ig_z)
    return out
