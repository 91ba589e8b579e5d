"""Entropy-model correctness: factorized bottleneck, Gaussian and GMM PMFs."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_image_compression_tpu.entropy import (
    FactorizedEntropyBottleneck, discretized_gaussian_pmf, discretized_mixture_pmf,
    gaussian_likelihood, mixture_likelihood,
)


@pytest.fixture(scope="module")
def feb():
    model = FactorizedEntropyBottleneck(channels=8)
    x = jnp.zeros((1, 2, 2, 8))
    vs = model.init(jax.random.PRNGKey(42), x)
    return model, vs


class TestFactorizedBottleneck:
    def test_cdf_monotone(self, feb):
        model, vs = feb
        xs = jnp.linspace(-30, 30, 401)
        cdf = np.asarray(model.apply(vs, xs, method="grid_cdf"))  # (C, N)
        assert np.all(np.diff(cdf, axis=1) >= -1e-7)

    def test_cdf_limits(self, feb):
        model, vs = feb
        xs = jnp.array([-1000.0, 1000.0])
        cdf = np.asarray(model.apply(vs, xs, method="grid_cdf"))
        np.testing.assert_allclose(cdf[:, 0], 0.0, atol=1e-5)
        np.testing.assert_allclose(cdf[:, 1], 1.0, atol=1e-5)

    def test_pmf_sums_to_one(self, feb):
        model, vs = feb
        xs = jnp.arange(-200, 201).astype(jnp.float32)
        pmf = np.asarray(model.apply(vs, xs, method="grid_pmf"))
        np.testing.assert_allclose(pmf.sum(axis=1), 1.0, atol=1e-3)

    def test_likelihood_matches_naive_formula(self, feb):
        """likelihood(x) == sigmoid(L(x+.5)) - sigmoid(L(x-.5)) computed
        without the sign trick (they must agree where both are stable)."""
        model, vs = feb
        key = jax.random.PRNGKey(0)
        x = 4.0 * jax.random.normal(key, (2, 3, 3, 8))
        lik = np.asarray(model.apply(vs, x, method="likelihood"))
        # compare against the no-sign-trick per-channel path (channel_pmf)
        for ch in range(8):
            pts = x[..., ch].reshape(-1)
            pmf = np.asarray(model.apply(vs, ch, pts, method="channel_pmf"))
            np.testing.assert_allclose(lik[..., ch].reshape(-1), pmf, rtol=1e-4, atol=1e-6)

    def test_likelihood_floor(self, feb):
        model, vs = feb
        x = jnp.full((1, 1, 1, 8), 1e4)  # far in the tail
        lik = np.asarray(model.apply(vs, x))
        assert np.all(lik >= 1e-9)

    def test_init_values_match_tfc_scheme(self):
        """matrix init = log(expm1(1/scale/out)), scale = 10^(1/4)
        (EntropyModels.py:70-86)."""
        model = FactorizedEntropyBottleneck(channels=4)
        vs = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 1, 4)))
        p = vs["params"]
        scale = 10.0 ** 0.25
        np.testing.assert_allclose(
            np.asarray(p["matrix_0"]),
            math.log(math.expm1(1.0 / scale / 3)), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(p["matrix_3"]),
            math.log(math.expm1(1.0 / scale / 1)), rtol=1e-6)
        assert p["matrix_0"].shape == (4, 3, 1)
        assert p["matrix_3"].shape == (4, 1, 3)
        assert p["factor_0"].shape == (4, 3, 1)
        assert np.all(np.asarray(p["factor_0"]) == 0)
        assert np.all(np.abs(np.asarray(p["bias_1"])) <= 0.5)

    def test_gradients_flow(self, feb):
        model, vs = feb
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2, 8))

        def loss(params):
            p = model.apply({"params": params}, x)
            return -jnp.sum(jnp.log(p))

        g = jax.grad(loss)(vs["params"])
        total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g))
        assert np.isfinite(total) and total > 0


class TestGaussianPMF:
    def test_pmf_sums_to_one(self):
        xs = jnp.arange(-60, 61).astype(jnp.float32)
        pmf = discretized_gaussian_pmf(xs, mu=jnp.array(0.3), sigma=jnp.array(2.0))
        np.testing.assert_allclose(float(pmf.sum()), 1.0, atol=1e-5)

    def test_matches_scipy_formula(self):
        from math import erf, sqrt

        def phi(v):
            return 0.5 * (1 + erf(v / sqrt(2)))

        x, mu, sigma = 1.0, 0.25, 0.7
        expected = phi((x + 0.5 - mu) / sigma) - phi((x - 0.5 - mu) / sigma)
        got = float(discretized_gaussian_pmf(
            jnp.array(x), jnp.array(mu), jnp.array(sigma)))
        assert abs(got - expected) < 1e-6

    def test_likelihood_floor(self):
        lik = gaussian_likelihood(jnp.array(100.0), jnp.array(0.0), jnp.array(0.1))
        assert float(lik) >= 1e-9 * (1 - 1e-6)  # f32 representation of the floor

    def test_mixture_reduces_to_single(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, 4, 4, 8))
        mu = 0.1 * jax.random.normal(key, (2, 4, 4, 8))
        sigma = jnp.ones((2, 4, 4, 8)) * 0.8
        single = discretized_gaussian_pmf(x, mu, sigma)
        # K=1 mixture with weight 1
        mixture = discretized_mixture_pmf(
            x, jnp.ones((2, 4, 4, 1, 8)), mu[..., None, :], sigma[..., None, :])
        np.testing.assert_allclose(np.asarray(mixture), np.asarray(single),
                                   rtol=1e-5, atol=1e-7)

    def test_mixture_manual(self):
        x = jnp.array(0.0).reshape(1, 1, 1, 1)
        w = jnp.array([0.25, 0.75]).reshape(1, 1, 1, 2, 1)
        mus = jnp.array([-1.0, 2.0]).reshape(1, 1, 1, 2, 1)
        sig = jnp.array([0.5, 1.5]).reshape(1, 1, 1, 2, 1)
        got = float(discretized_mixture_pmf(x, w, mus, sig)[0, 0, 0, 0])
        p0 = float(discretized_gaussian_pmf(jnp.array(0.0), jnp.array(-1.0), jnp.array(0.5)))
        p1 = float(discretized_gaussian_pmf(jnp.array(0.0), jnp.array(2.0), jnp.array(1.5)))
        assert abs(got - (0.25 * p0 + 0.75 * p1)) < 1e-6

    def test_mixture_pmf_sums_to_one(self):
        xs = jnp.arange(-60, 61).astype(jnp.float32).reshape(1, 1, -1, 1)
        w = jnp.broadcast_to(jnp.array([0.3, 0.7]).reshape(1, 1, 1, 2, 1), (1, 1, 121, 2, 1))
        mus = jnp.broadcast_to(jnp.array([-2.0, 3.0]).reshape(1, 1, 1, 2, 1), (1, 1, 121, 2, 1))
        sig = jnp.broadcast_to(jnp.array([1.0, 2.0]).reshape(1, 1, 1, 2, 1), (1, 1, 121, 2, 1))
        pmf = discretized_mixture_pmf(xs, w, mus, sig)
        np.testing.assert_allclose(float(pmf.sum()), 1.0, atol=1e-5)
