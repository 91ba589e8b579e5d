"""Learned factorized entropy bottleneck (Ballé et al. 2018, appendix 6.1).

Capability parity with the reference's `FactorizedEntropyBottleneck`
(EntropyModels.py:49-184): each channel's cumulative distribution is a tiny
monotone MLP — softplus-positive matrices, free biases, tanh-gated skip
factors — with the TFC-style constant init log(expm1(1/scale/out)),
init_scale=10, filters (3,3,3). The discrete likelihood of a (noisy or
rounded) value x is sigmoid(L(x+.5)) - sigmoid(L(x-.5)) computed with the
sign-flip stabilization trick (EntropyModels.py:137-143).

TPU-first layout: instead of the reference's (C, 1, N) permute/flatten
round-trip (EntropyModels.py:124-151), values stay NHWC and the per-channel
chain is evaluated with channel-batched einsums where N = B*H*W rides the
lane dimension. out/in dims are at most `max(filters)` (=3) so each layer is
effectively a fused small matmul + bias + tanh gate — XLA fuses the whole
chain into a few VPU ops. Always float32.
"""

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from neural_image_compression_tpu.entropy.base import DEFAULT_LIKELIHOOD_LOWER_BOUND, clamp_likelihood


class FactorizedEntropyBottleneck(nn.Module):
    channels: int
    init_scale: float = 10.0
    filters: Tuple[int, ...] = (3, 3, 3)
    likelihood_lower_bound: float = DEFAULT_LIKELIHOOD_LOWER_BOUND

    def setup(self):
        filters_full = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1.0 / (len(self.filters) + 1))
        matrices, biases, factors = [], [], []
        for i in range(len(self.filters) + 1):
            out = filters_full[i + 1]
            inp = filters_full[i]
            init_val = math.log(math.expm1(1.0 / scale / out))
            matrices.append(self.param(
                f"matrix_{i}",
                lambda key, shape, v=init_val: jnp.full(shape, v, jnp.float32),
                (self.channels, out, inp)))
            biases.append(self.param(
                f"bias_{i}",
                lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -0.5, 0.5),
                (self.channels, out, 1)))
            if i < len(self.filters):
                factors.append(self.param(
                    f"factor_{i}",
                    lambda key, shape: jnp.zeros(shape, jnp.float32),
                    (self.channels, out, 1)))
        self._matrices = matrices
        self._biases = biases
        self._factors = factors

    # --- core chain -------------------------------------------------------
    def _logits_cumulative(self, x: jax.Array) -> jax.Array:
        """x: (C, in=1, N) float32 -> logits (C, 1, N)."""
        logits = x
        for i in range(len(self._matrices)):
            matrix = jax.nn.softplus(self._matrices[i])          # (C, out, in)
            logits = jnp.einsum("coi,cin->con", matrix, logits)  # channel-batched matmul
            logits = logits + self._biases[i]
            if i < len(self._factors):
                factor = jnp.tanh(self._factors[i])
                logits = logits + factor * jnp.tanh(logits)
        return logits

    def _nhwc_to_cn(self, x: jax.Array) -> jax.Array:
        """(B, H, W, C) -> (C, 1, B*H*W)."""
        b, h, w, c = x.shape
        return x.reshape(-1, c).T.reshape(c, 1, -1)

    def _cn_to_nhwc(self, x: jax.Array, shape) -> jax.Array:
        b, h, w, c = shape
        return x.reshape(c, -1).T.reshape(b, h, w, c)

    def likelihood(self, x: jax.Array) -> jax.Array:
        """Discrete likelihood of each element of NHWC input x (float32)."""
        shape = x.shape
        flat = self._nhwc_to_cn(x.astype(jnp.float32))
        lower = self._logits_cumulative(flat - 0.5)
        upper = self._logits_cumulative(flat + 0.5)
        # sign-flip stabilization: evaluate the sigmoid difference on the side
        # where both logits are small (EntropyModels.py:137-143).
        sign = -jnp.sign(lower + upper)
        sign = jax.lax.stop_gradient(sign)
        pmf = jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))
        return self._cn_to_nhwc(pmf, shape)

    def __call__(self, x: jax.Array) -> jax.Array:
        return clamp_likelihood(self.likelihood(x), self.likelihood_lower_bound)

    # --- coder / visualization hooks -------------------------------------
    def grid_logits(self, xs: jax.Array) -> jax.Array:
        """Evaluate CDF logits at grid xs (N,) for ALL channels -> (C, N).

        This is the on-device CDF-table generator feeding the host rANS coder
        (reference only exposes a per-channel loop, EntropyModels.py:153-169).
        """
        n = xs.shape[0]
        flat = jnp.broadcast_to(xs.astype(jnp.float32)[None, None, :],
                                (self.channels, 1, n))
        return self._logits_cumulative(flat)[:, 0, :]

    def grid_cdf(self, xs: jax.Array) -> jax.Array:
        return jax.nn.sigmoid(self.grid_logits(xs))

    def grid_pmf(self, xs: jax.Array) -> jax.Array:
        """Discrete PMF at bin centers xs for all channels -> (C, N), >=1e-12."""
        up = jax.nn.sigmoid(self.grid_logits(xs + 0.5))
        lo = jax.nn.sigmoid(self.grid_logits(xs - 0.5))
        return jnp.maximum(up - lo, 1e-12)

    def channel_cdf(self, ch: int, xs: jax.Array) -> jax.Array:
        """Learned CDF of one channel at points xs (EntropyModels.py:171-174)."""
        return self.grid_cdf(xs)[ch]

    def channel_pmf(self, ch: int, xs: jax.Array) -> jax.Array:
        """Discrete PMF of one channel at bin centers xs (EntropyModels.py:176-184)."""
        return self.grid_pmf(xs)[ch]
