"""Entropy-model base utilities.

Mirror of the reference's `EntropyModel` interface (EntropyModels.py:11-46):
subclasses expose a likelihood clamped from below at `likelihood_lower_bound`
(1e-9) for numerical stability, and hooks to evaluate per-channel CDFs/PMFs
used by visualizations and, in this framework, by the real bitstream coder.

Entropy math is always float32: a 1e-9 floor underflows bf16.
"""

import jax.numpy as jnp

DEFAULT_LIKELIHOOD_LOWER_BOUND = 1e-9


def clamp_likelihood(p, lower_bound: float = DEFAULT_LIKELIHOOD_LOWER_BOUND):
    """Clamp likelihood from below (EntropyModels.py:31)."""
    return jnp.maximum(p, lower_bound)
