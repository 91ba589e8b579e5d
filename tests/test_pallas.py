"""Pallas kernels vs their jnp references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from neural_image_compression_tpu.ops.pallas.gdn_kernel import fused_gdn
from neural_image_compression_tpu.ops.pallas.gmm_kernel import (
    fused_mixture_log_likelihood, mixture_log_likelihood_reference,
)

KEY = jax.random.PRNGKey(0)


def test_gmm_kernel_matches_reference():
    """Symbols drawn FROM the mixture (the trained-model regime): the kernel's
    rational-erf tails only diverge for sub-1e-6-probability symbols."""
    n, k, m = 300, 3, 128  # non-multiple of block to exercise padding
    keys = jax.random.split(KEY, 5)
    w = jax.nn.softmax(jax.random.normal(keys[1], (n, k, m)), axis=1)
    mus = 2 * jax.random.normal(keys[2], (n, k, m))
    sigmas = jax.nn.softplus(jax.random.normal(keys[3], (n, k, m))) + 1e-6
    comp = jax.random.categorical(keys[4], jnp.log(w), axis=1)  # (n, m)
    mu_sel = jnp.take_along_axis(mus, comp[:, None, :], axis=1)[:, 0, :]
    sig_sel = jnp.take_along_axis(sigmas, comp[:, None, :], axis=1)[:, 0, :]
    y = jnp.round(mu_sel + sig_sel * jax.random.normal(keys[0], (n, m)))
    got = fused_mixture_log_likelihood(y, w, mus, sigmas, block_n=128,
                                       interpret=True)
    ref = mixture_log_likelihood_reference(y, w, mus, sigmas)
    got, ref = np.asarray(got), np.asarray(ref)
    # exact agreement where p > 1e-6; tail symbols may deviate (documented)
    bulk = ref > np.log(1e-6)
    assert bulk.mean() > 0.99
    np.testing.assert_allclose(got[bulk], ref[bulk], rtol=1e-3, atol=2e-3)
    # total rate (the quantity that matters) matches to <0.01%
    np.testing.assert_allclose(got.sum(), ref.sum(), rtol=1e-4)


def test_gmm_kernel_floor():
    y = jnp.full((8, 128), 1000.0)
    w = jnp.ones((8, 1, 128))
    mus = jnp.zeros((8, 1, 128))
    sigmas = jnp.ones((8, 1, 128))
    got = fused_mixture_log_likelihood(y, w, mus, sigmas, block_n=8,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.log(1e-9), rtol=1e-5)


def test_gdn_kernel_matches_closed_form():
    n, c = 500, 64
    x = jax.random.normal(KEY, (2, 5, 50, c))
    gamma = 0.1 * jnp.eye(c)
    beta = jnp.ones(c)
    got = fused_gdn(x, gamma, beta, block_n=256, interpret=True)
    expected = x / jnp.sqrt(1.0 + 0.1 * x * x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-6)


def test_igdn_kernel():
    c = 32
    x = jax.random.normal(KEY, (1, 4, 8, c))
    gamma = 0.1 * jnp.eye(c)
    beta = jnp.ones(c)
    got = fused_gdn(x, gamma, beta, inverse=True, block_n=32, interpret=True)
    expected = x * jnp.sqrt(1.0 + 0.1 * x * x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-6)
