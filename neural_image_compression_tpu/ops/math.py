"""Scalar math utilities used by the entropy models.

Equivalent capability to the reference's `utils.gaussian_cdf` (utils.py:6-8),
kept in float32 on TPU because entropy math underflows in bf16 (likelihood
floor is 1e-9).
"""

import math

import jax
import jax.numpy as jnp

_INV_SQRT2 = 1.0 / math.sqrt(2.0)
LOG2 = math.log(2.0)


def gaussian_cdf(x: jax.Array) -> jax.Array:
    """Standard normal CDF via erf, computed in float32."""
    x = x.astype(jnp.float32)
    return 0.5 * (1.0 + jax.lax.erf(x * _INV_SQRT2))


def nats_to_bits(x: jax.Array) -> jax.Array:
    return x / LOG2
