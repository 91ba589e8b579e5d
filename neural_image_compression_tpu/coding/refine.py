"""Encode-time latent refinement: close the amortization gap at inference.

The encoder network is an amortized inference machine — one feed-forward
guess of the latents that minimize rate + lambda * distortion. At encode
time nothing forces us to stop at the guess: the TRUE objective
R(round(y), round(z)) + lambda * D(decoder(round(y)), x) is differentiable
through a straight-through rounding estimator, so a few dozen Adam steps on
the latents themselves (weights frozen) recover most of the gap (Yang,
Bamler & Mandt, NeurIPS 2020, "Improving Inference for Neural Image
Compression"). Decode is completely unchanged: entropy parameters derive
only from z_q and the coded-y context, so a refined stream is
indistinguishable from a vanilla one to every decoder in this package —
pair with the codecs' `compress_latents`.

TPU shape: the whole refinement is ONE jitted program (lax.scan over Adam
steps; each step is a decoder+hyper forward/backward — pure MXU work), so
per-image cost is a handful of device passes with no host round-trips
inside the loop, and it batches over images for free.

Supported families: every model family — single-layer
(joint_ar/checkerboard/channel_cb via entropy_params_from_latents,
hyperprior via entropy_params_from_hyper, factorized y-only) and the
two-layer scalable family (per-layer likelihoods through its own
context/EP pairs, optimized under the two-layer vision_rd_loss objective
without the distillation term — the refined stream still truncates).
"""

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from neural_image_compression_tpu.entropy.gaussian import (
    gaussian_likelihood, mixture_likelihood,
)
from neural_image_compression_tpu.train.loss import rd_loss

__all__ = ["make_refiner", "refine_latents"]


def _ste_round(v: jax.Array) -> jax.Array:
    """round(v) in the forward pass, identity in the backward pass."""
    return v + jax.lax.stop_gradient(jnp.round(v) - v)


def _mode(model) -> str:
    from neural_image_compression_tpu.models.factorized_prior import (
        FactorizedPrior,
    )
    from neural_image_compression_tpu.models.scalable import (
        ScalableImageCoding,
    )

    if isinstance(model, FactorizedPrior):
        return "factorized"
    if isinstance(model, ScalableImageCoding):
        return "scalable"
    if hasattr(type(model), "entropy_params_from_latents"):
        return "ctx"
    if hasattr(type(model), "entropy_params_from_hyper"):
        return "hyper"
    raise NotImplementedError(
        f"latent refinement does not support {type(model).__name__} "
        f"(no latent-conditional entropy-parameter entry point)")


def make_refiner(model, variables, lambda_rd: float, steps: int = 100,
                 lr: float = 1e-3) -> Callable[[jax.Array], Tuple]:
    """Build a jitted `refine(x) -> (y_q, z_q, metrics)`.

    x: (B, H, W, 3) float32 in [0, 1], H/W multiples of 64 (16 for the
    factorized family) — pad first (data.pad_to_multiple), exactly as the
    codecs do internally. y_q/z_q are float32 grids of integers, ready for
    `codec.compress_latents` (z_q is a zero-size placeholder for the
    factorized family). metrics holds rd_loss entries for the encoder's
    amortized latents ("pre_*") and the refined ones ("post_*"); both are
    TRUE eval values (the forward sees rounded latents).
    """
    mode = _mode(model)
    tx = optax.adam(lr)

    if mode == "factorized":
        def body(mdl, y_in):
            p_y = mdl.factorized_entropy_model(y_in)
            x_hat = mdl.decoder(y_in, False).astype(jnp.float32)
            zero = jnp.zeros((y_in.shape[0], 1, 1, 1), jnp.float32)
            return {"x_hat": x_hat, "logp_y": jnp.log(p_y), "logp_z": zero}

        def out_from(latents):
            (y,) = latents
            return model.apply(variables, _ste_round(y), method=body)
    elif mode == "scalable":
        def body(mdl, y_in, z_in):
            m1 = mdl.base_channels
            y1, y2 = y_in[..., :m1], y_in[..., m1:]
            psi = mdl.hyper_decoder(z_in, False)
            c1 = jnp.concatenate([mdl.context_model_1(y1), psi], axis=-1)
            c2 = jnp.concatenate([mdl.context_model_2(y2), psi], axis=-1)
            if mdl.K == 1:
                mu1, s1 = mdl.entropy_parameters_1(c1)
                mu2, s2 = mdl.entropy_parameters_2(c2)
                p1 = gaussian_likelihood(y1, mu1, s1)
                p2 = gaussian_likelihood(y2, mu2, s2)
            else:
                w1, mu1, s1 = mdl.entropy_parameters_1(c1)
                w2, mu2, s2 = mdl.entropy_parameters_2(c2)
                p1 = mixture_likelihood(y1, w1, mu1, s1)
                p2 = mixture_likelihood(y2, w2, mu2, s2)
            p_z = mdl.factorized_entropy_model(z_in)
            x_hat = mdl.decoder(y_in, False).astype(jnp.float32)
            return {"x_hat": x_hat, "logp_y1": jnp.log(p1),
                    "logp_y2": jnp.log(p2), "logp_z": jnp.log(p_z)}

        def out_from(latents):
            y, z = latents
            return model.apply(variables, _ste_round(y), _ste_round(z),
                               method=body)
    else:
        def body(mdl, y_in, z_in):
            if mode == "ctx":
                params_t = mdl.entropy_params_from_latents(y_in, z_in)
            else:
                params_t = mdl.entropy_params_from_hyper(z_in)
            if mdl.K == 1:
                mu, sigma = params_t
                p_y = gaussian_likelihood(y_in, mu, sigma)
            else:
                weights, mus, sigmas = params_t
                p_y = mixture_likelihood(y_in, weights, mus, sigmas)
            p_z = mdl.factorized_entropy_model(z_in)
            x_hat = mdl.decoder(y_in, False).astype(jnp.float32)
            return {"x_hat": x_hat, "logp_y": jnp.log(p_y),
                    "logp_z": jnp.log(p_z)}

        def out_from(latents):
            y, z = latents
            return model.apply(variables, _ste_round(y), _ste_round(z),
                               method=body)

    def loss_fn(latents, x):
        if mode == "scalable":
            from neural_image_compression_tpu.train.loss import vision_rd_loss

            m = vision_rd_loss(out_from(latents), x, lambda_rd)
        else:
            m = rd_loss(out_from(latents), x, lambda_rd)
        return m["loss"], m

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @jax.jit
    def refine(x: jax.Array):
        out0 = model.apply(variables, x, training=False)
        y = out0["y"].astype(jnp.float32)
        latents = ((y,) if mode == "factorized"
                   else (y, out0["z"].astype(jnp.float32)))
        (_, m0), _ = grad_fn(latents, x)

        def step(carry, _):
            latents, opt_state = carry
            (_, m), g = grad_fn(latents, x)
            updates, opt_state = tx.update(g, opt_state)
            return (optax.apply_updates(latents, updates), opt_state), None

        (latents, _), _ = jax.lax.scan(step, (latents, tx.init(latents)),
                                       None, length=steps)
        (_, m1), _ = grad_fn(latents, x)
        metrics: Dict[str, Any] = {}
        for k in ("loss", "bpp_total", "bpp_y", "bpp_z", "psnr", "mse"):
            metrics["pre_" + k] = m0[k]
            metrics["post_" + k] = m1[k]
        y_q = jnp.round(latents[0])
        z_q = (jnp.round(latents[1]) if mode != "factorized"
               else jnp.zeros((x.shape[0], 0, 0, 0), jnp.float32))
        return y_q, z_q, metrics

    return refine


def refine_latents(model, variables, x, lambda_rd: float, steps: int = 100,
                   lr: float = 1e-3):
    """One-shot convenience wrapper around make_refiner (builds and jits a
    fresh program per call — reuse make_refiner for many images)."""
    return make_refiner(model, variables, lambda_rd, steps, lr)(x)
