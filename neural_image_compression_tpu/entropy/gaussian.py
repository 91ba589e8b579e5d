"""Discretized (mixture-of-)Gaussian conditional likelihoods — pure functions.

Parity targets in the reference:
  * GaussianConditional.discretized_gaussian_pmf  (EntropyModels.py:192-204)
  * GaussianMixtureConditional.discretized_mixture_pmf (EntropyModels.py:214-230)

TPU-first differences: pure float32 functions over NHWC tensors (no nn.Module
state — there is none to keep), and the mixture layout is (B, H, W, K, M) so
the channel dim M stays on lanes and the K reduction is a cheap sublane sum.
"""

import jax
import jax.numpy as jnp

from neural_image_compression_tpu.entropy.base import DEFAULT_LIKELIHOOD_LOWER_BOUND, clamp_likelihood
from neural_image_compression_tpu.ops.math import gaussian_cdf


def discretized_gaussian_pmf(x: jax.Array, mu: jax.Array, sigma: jax.Array) -> jax.Array:
    """P(bin containing x) = Phi((x+.5-mu)/sigma) - Phi((x-.5-mu)/sigma)."""
    x = x.astype(jnp.float32)
    mu = mu.astype(jnp.float32)
    inv_sigma = 1.0 / sigma.astype(jnp.float32)
    upper = gaussian_cdf((x + 0.5 - mu) * inv_sigma)
    lower = gaussian_cdf((x - 0.5 - mu) * inv_sigma)
    return upper - lower


def gaussian_likelihood(x, mu, sigma,
                        lower_bound: float = DEFAULT_LIKELIHOOD_LOWER_BOUND):
    """Mean-scale Gaussian conditional likelihood, clamped (K=1 path)."""
    return clamp_likelihood(discretized_gaussian_pmf(x, mu, sigma), lower_bound)


def discretized_mixture_pmf(x: jax.Array, weights: jax.Array, mus: jax.Array,
                            sigmas: jax.Array) -> jax.Array:
    """Mixture-of-Gaussians PMF.

    x:                (B, H, W, M)
    weights/mus/sigmas: (B, H, W, K, M), weights softmaxed over K.
    Returns (B, H, W, M).
    """
    x_exp = x[..., None, :]  # (B, H, W, 1, M)
    pmf_k = discretized_gaussian_pmf(x_exp, mus, sigmas)
    return jnp.sum(weights.astype(jnp.float32) * pmf_k, axis=-2)


def mixture_likelihood(x, weights, mus, sigmas,
                       lower_bound: float = DEFAULT_LIKELIHOOD_LOWER_BOUND):
    """Gaussian-mixture conditional likelihood, clamped (K>1 path)."""
    return clamp_likelihood(discretized_mixture_pmf(x, weights, mus, sigmas), lower_bound)
