"""Generalized Divisive Normalization (GDN / IGDN) — TPU-native.

The reference imports `compressai.layers.gdn.GDN` (Layers.py:3, Components.py:2)
with `beta_min=1e-6, gamma_init=0.1` everywhere. Math:

    y_i = x_i / sqrt(beta_i + sum_j gamma_{ij} x_j^2)        (GDN)
    y_i = x_i * sqrt(beta_i + sum_j gamma_{ij} x_j^2)        (IGDN)

beta/gamma are kept non-negative by compressai's sqrt+pedestal
reparametrization with a straight-through LowerBound (see ops/bound.py), which
we re-derive here and parity-test against closed forms in tests.

TPU mapping: the 1x1 "conv" over x^2 is a single (B*H*W, C) x (C, C) matmul —
it rides the MXU, and XLA fuses the square, bias add, rsqrt and multiply around
it, so no hand-written kernel is needed for the fwd pass; a fused Pallas
variant lives in ops/pallas/ for the hot path.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from neural_image_compression_tpu.ops.bound import nonneg, nonneg_init


class GDN(nn.Module):
    """GDN (inverse=False) / IGDN (inverse=True), NHWC.

    Init matches the reference configuration: beta = 1, gamma = gamma_init * I
    (stored in sqrt+pedestal form), beta_min = 1e-6.
    """

    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    dtype: Optional[Any] = None
    # use_pallas: opt-in fused Pallas kernel (custom-VJP; f32 compute).
    # Standalone it beats XLA 1.7x (tools/ab_bench2.py), but wired into the
    # model it is a net LOSS (bf16 -> f32 cast + broken conv/GDN fusion:
    # 1010 vs 1530 img/s at batch 16), so the default stays the XLA path.
    use_pallas: Optional[bool] = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        beta_raw = self.param(
            "beta", lambda key, shape: nonneg_init(jnp.ones(shape, jnp.float32)), (c,))
        gamma_raw = self.param(
            "gamma",
            lambda key, shape: nonneg_init(self.gamma_init * jnp.eye(c, dtype=jnp.float32)),
            (c, c))

        beta = nonneg(beta_raw, minimum=self.beta_min)
        gamma = nonneg(gamma_raw)  # (C_in, C_out); symmetric init so orientation-free

        if self.use_pallas:
            from neural_image_compression_tpu.ops.pallas.gdn_kernel import gdn_fused_op

            return gdn_fused_op(x, gamma, beta, self.inverse).astype(x.dtype)

        compute_dtype = self.dtype or x.dtype
        xc = x.astype(compute_dtype)
        # norm_o = beta_o + sum_i gamma[i, o] * x_i^2  — one MXU matmul.
        norm = jnp.dot((xc * xc), gamma.astype(compute_dtype),
                       preferred_element_type=jnp.float32)
        norm = norm + beta
        if self.inverse:
            out = xc.astype(jnp.float32) * jnp.sqrt(norm)
        else:
            out = xc.astype(jnp.float32) * jax.lax.rsqrt(norm)
        return out.astype(x.dtype)
