"""Fused Gaussian-mixture log-likelihood Pallas kernel.

Computes, in one VMEM pass per tile:

    logp[n, m] = log(max(sum_k w[n,k,m] * (Phi(u) - Phi(l)), 1e-9))
      u = (y[n,m] + .5 - mu[n,k,m]) / sigma[n,k,m],  l = ... - .5 ...

The jnp path materializes the (N, K, M) broadcast of y plus four (N, K, M)
temporaries (two erf args, two CDFs) in HBM; the kernel keeps everything in
VMEM and reads each input exactly once — HBM traffic drops from ~(9KM + 2M)
floats per position to (3KM + 2M).

Shapes: y (N, M); w/mu/sigma (N, K, M); K is a static python int unrolled in
the kernel (K is 1..5 in practice). Always float32 (1e-9 floor).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_FLOOR = 1e-9

# f32 erf rational approximation (XLA's ErfImpl32 coefficients): for
# |x| <= 4, erf(x) = x * P(x^2) / Q(x^2); saturates to +-1 outside.
# Pallas TPU has no erf primitive, so we lower it ourselves.
#
# Accuracy note: absolute error ~1e-7 — bitwise-comparable to f32 erf in the
# bulk, but in the mid-tail (likelihoods between ~1e-9 and ~1e-6) logp can
# deviate by O(1) nats. For a trained model y ~ N(mu, sigma), such symbols
# occur with probability < 1e-6, so the bpp estimate is unaffected to <0.01%;
# the exact jnp path (entropy/gaussian.py) remains the default for training.
_ERF_ALPHA = (-2.72614225801306e-10, 2.77068142495902e-08,
              -2.10102402082508e-06, -5.69250639462346e-05,
              -7.34990630326855e-04, -2.95459980854025e-03,
              -1.60960333262415e-02)
_ERF_BETA = (-1.45660718464996e-05, -2.13374055278905e-04,
             -1.68282697438203e-03, -7.37332916720468e-03,
             -1.42647390514189e-02)


def _poly(x, coeffs):
    acc = jnp.full_like(x, coeffs[0])
    for c in coeffs[1:]:
        acc = acc * x + c
    return acc


def _erf(x):
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    return x * _poly(x2, _ERF_ALPHA) / _poly(x2, _ERF_BETA)


def _kernel(y_ref, w_ref, mu_ref, sigma_ref, out_ref, *, K: int):
    y = y_ref[:]  # (TN, M)
    acc = jnp.zeros_like(y)
    for k in range(K):
        mu = mu_ref[:, k, :]
        inv_s = 1.0 / sigma_ref[:, k, :]
        up = 0.5 * (1.0 + _erf((y + 0.5 - mu) * inv_s * _INV_SQRT2))
        lo = 0.5 * (1.0 + _erf((y - 0.5 - mu) * inv_s * _INV_SQRT2))
        acc = acc + w_ref[:, k, :] * (up - lo)
    out_ref[:] = jnp.log(jnp.maximum(acc, _FLOOR))


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def fused_mixture_log_likelihood(y: jax.Array, weights: jax.Array,
                                 mus: jax.Array, sigmas: jax.Array,
                                 block_n: int = 256,
                                 interpret: bool = False) -> jax.Array:
    """y: (N, M) f32; weights/mus/sigmas: (N, K, M) f32 -> logp (N, M) f32."""
    n, m = y.shape
    k = weights.shape[1]
    pad = (-n) % block_n
    if pad:
        y = jnp.pad(y, ((0, pad), (0, 0)))
        one = jnp.ones((pad, k, m), jnp.float32)
        weights = jnp.concatenate([weights, one / k], axis=0)
        mus = jnp.concatenate([mus, jnp.zeros((pad, k, m), jnp.float32)], axis=0)
        sigmas = jnp.concatenate([sigmas, one], axis=0)
    np_ = y.shape[0]

    grid = (np_ // block_n,)
    out = pl.pallas_call(
        functools.partial(_kernel, K=k),
        out_shape=jax.ShapeDtypeStruct((np_, m), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, k, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, k, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, k, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(y.astype(jnp.float32), weights.astype(jnp.float32),
      mus.astype(jnp.float32), sigmas.astype(jnp.float32))
    return out[:n]


def mixture_log_likelihood_reference(y, weights, mus, sigmas):
    """jnp reference for testing: same math, materialized broadcasts."""
    y_exp = y[:, None, :]
    inv_s = 1.0 / sigmas
    up = 0.5 * (1.0 + jax.lax.erf((y_exp + 0.5 - mus) * inv_s * _INV_SQRT2))
    lo = 0.5 * (1.0 + jax.lax.erf((y_exp - 0.5 - mus) * inv_s * _INV_SQRT2))
    p = jnp.sum(weights * (up - lo), axis=1)
    return jnp.log(jnp.maximum(p, _FLOOR))
