"""Straight-through bound operators.

These reproduce the semantics of compressai's `LowerBound` (used by the
reference via `compressai.layers.gdn.GDN`, Layers.py:3): forward clamps,
backward passes the gradient through whenever the input is inside the bound OR
the gradient pushes the value back toward the feasible region.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def lower_bound(x: jax.Array, bound: float) -> jax.Array:
    """max(x, bound) with a straight-through gradient.

    Gradient passes iff ``x >= bound`` or the incoming cotangent is negative
    (i.e. the step would increase x back above the bound).
    """
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), x


def _lower_bound_bwd(bound, x, g):
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0),)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def upper_bound(x: jax.Array, bound: float) -> jax.Array:
    """min(x, bound) with a straight-through gradient (mirror of lower_bound)."""
    return jnp.minimum(x, bound)


def _upper_bound_fwd(x, bound):
    return jnp.minimum(x, bound), x


def _upper_bound_bwd(bound, x, g):
    pass_through = (x <= bound) | (g > 0)
    return (jnp.where(pass_through, g, 0.0),)


upper_bound.defvjp(_upper_bound_fwd, _upper_bound_bwd)


# --- Non-negative reparametrization ------------------------------------------
#
# compressai stores non-negative parameters v as r = sqrt(v + pedestal) and
# recovers v = lower_bound(r, sqrt(minimum + pedestal))**2 - pedestal, with
# pedestal = reparam_offset**2, reparam_offset = 2**-18. The reference's GDN
# (beta_min=1e-6, gamma_init=0.1; Layers.py:41,75, Components.py:11-15) relies
# on exactly this scheme, so we match it for parity.

REPARAM_OFFSET = 2.0 ** -18
PEDESTAL = REPARAM_OFFSET ** 2


def nonneg_init(value: jax.Array, pedestal: float = PEDESTAL) -> jax.Array:
    """Map an initial non-negative value to its stored (sqrt) representation."""
    return jnp.sqrt(jnp.maximum(value + pedestal, pedestal))


def nonneg(raw: jax.Array, minimum: float = 0.0, pedestal: float = PEDESTAL) -> jax.Array:
    """Recover the non-negative value (>= minimum) from its stored form."""
    bound = (minimum + pedestal) ** 0.5
    out = lower_bound(raw, bound)
    return out * out - pedestal
