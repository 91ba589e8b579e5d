"""Golden-value parity against the reference implementation.

Fixtures in tests/golden/*.npz were produced by running the reference
PyTorch code as an oracle (tools/export_golden.py) on fixed inputs; these
tests verify this framework reproduces the reference numerics bit-for-bit
(up to f32 tolerance) WITHOUT copying its code or requiring it at test time.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

pytestmark = pytest.mark.skipif(not os.path.isdir(GOLDEN),
                                reason="golden fixtures not exported")


def _nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


class TestFactorizedGolden:
    @pytest.fixture(scope="class")
    def fixture(self):
        return np.load(os.path.join(GOLDEN, "factorized_ref.npz"))

    def _model_and_params(self, fx):
        from neural_image_compression_tpu.entropy import FactorizedEntropyBottleneck

        c = fx["x"].shape[1]
        model = FactorizedEntropyBottleneck(channels=c)
        params = {}
        for i in range(4):
            params[f"matrix_{i}"] = jnp.asarray(fx[f"matrix_{i}"])
            params[f"bias_{i}"] = jnp.asarray(fx[f"bias_{i}"])
            if i < 3:
                params[f"factor_{i}"] = jnp.asarray(fx[f"factor_{i}"])
        return model, {"params": params}

    def test_likelihood_matches_reference(self, fixture):
        model, variables = self._model_and_params(fixture)
        x = jnp.asarray(_nchw_to_nhwc(fixture["x"]))
        lik = np.asarray(model.apply(variables, x))
        ref = _nchw_to_nhwc(fixture["likelihood"])
        np.testing.assert_allclose(lik, ref, rtol=1e-5, atol=1e-7)

    def test_channel_cdf_pmf_match_reference(self, fixture):
        model, variables = self._model_and_params(fixture)
        xs = jnp.asarray(fixture["xs"])
        cdf = np.asarray(model.apply(variables, xs, method="grid_cdf"))
        pmf = np.asarray(model.apply(variables, xs, method="grid_pmf"))
        np.testing.assert_allclose(cdf, fixture["channel_cdf"], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(pmf, np.maximum(fixture["channel_pmf"], 1e-12),
                                   rtol=1e-4, atol=1e-7)


class TestGaussianGolden:
    @pytest.fixture(scope="class")
    def fixture(self):
        return np.load(os.path.join(GOLDEN, "gaussian_ref.npz"))

    def test_gaussian_conditional(self, fixture):
        from neural_image_compression_tpu.entropy import gaussian_likelihood

        p = gaussian_likelihood(jnp.asarray(_nchw_to_nhwc(fixture["x"])),
                                jnp.asarray(_nchw_to_nhwc(fixture["mu"])),
                                jnp.asarray(_nchw_to_nhwc(fixture["sigma"])))
        # atol 3e-7: torch vs jax f32 erf differ by ~1 ulp in the deep tail
        np.testing.assert_allclose(np.asarray(p), _nchw_to_nhwc(fixture["p"]),
                                   rtol=1e-5, atol=3e-7)

    def test_gmm_conditional(self, fixture):
        from neural_image_compression_tpu.entropy import mixture_likelihood

        # reference layout (B, K, M, H, W) -> ours (B, H, W, K, M)
        def to_ours(a):
            return np.transpose(a, (0, 3, 4, 1, 2))

        p = mixture_likelihood(jnp.asarray(_nchw_to_nhwc(fixture["x"])),
                               jnp.asarray(to_ours(fixture["w"])),
                               jnp.asarray(to_ours(fixture["mus"])),
                               jnp.asarray(to_ours(fixture["sigmas"])))
        np.testing.assert_allclose(np.asarray(p), _nchw_to_nhwc(fixture["pm"]),
                                   rtol=1e-5, atol=1e-7)


def test_rd_loss_golden():
    from neural_image_compression_tpu.train import rd_loss

    fx = np.load(os.path.join(GOLDEN, "rd_loss_ref.npz"))
    out = {
        "x_hat": jnp.asarray(_nchw_to_nhwc(fx["x_hat"])),
        "logp_y": jnp.asarray(_nchw_to_nhwc(fx["logp_y"])),
        "logp_z": jnp.asarray(_nchw_to_nhwc(fx["logp_z"])),
    }
    res = rd_loss(out, jnp.asarray(_nchw_to_nhwc(fx["x"])), 0.01)
    np.testing.assert_allclose(float(res["loss"]), float(fx["loss"]), rtol=1e-5)
    for k in ("bpp_y", "bpp_z", "bpp_total", "mse", "psnr", "bits_total"):
        np.testing.assert_allclose(float(res[k]), float(fx[k]), rtol=1e-4)


class TestContextAndEntropyParamsGolden:
    """Masked-conv context model and EntropyParameters net vs the reference
    oracle (ContextModels.py:23-36, ParametersModels.py:8-64) — checks the
    causal mask, torch->NHWC weight mapping, and the GMM chunk/reshape/
    softmax order end to end."""

    @pytest.fixture(scope="class")
    def fixture(self):
        return np.load(os.path.join(GOLDEN, "context_ep_ref.npz"))

    def test_context_model(self, fixture):
        from neural_image_compression_tpu.ops.masked_conv import ContextModel

        fx = fixture
        m = fx["y"].shape[1]
        model = ContextModel(latent_channels=m)
        params = {"MaskedConv2d_0": {
            "kernel": jnp.asarray(np.transpose(fx["ctx_w"], (2, 3, 1, 0))),
            "bias": jnp.asarray(fx["ctx_b"])}}
        phi = model.apply({"params": params}, jnp.asarray(_nchw_to_nhwc(fx["y"])))
        np.testing.assert_allclose(np.asarray(phi), _nchw_to_nhwc(fx["phi"]),
                                   rtol=1e-5, atol=1e-5)

    def _ep_apply(self, fx, K):
        from neural_image_compression_tpu.models.parameters import EntropyParameters

        m = fx["y"].shape[1]
        model = EntropyParameters(latent_channels=m, hyper_latent_channels=m, K=K)
        params = {}
        for li in range(3):
            params[f"Conv2d_{li}"] = {
                "kernel": jnp.asarray(np.transpose(fx[f"ep{K}_w{li}"], (2, 3, 1, 0))),
                "bias": jnp.asarray(fx[f"ep{K}_b{li}"])}
        return model.apply({"params": params},
                           jnp.asarray(_nchw_to_nhwc(fx["combined"])))

    def test_entropy_parameters_k1(self, fixture):
        mu, sigma = self._ep_apply(fixture, 1)
        np.testing.assert_allclose(np.asarray(mu), _nchw_to_nhwc(fixture["ep1_mu"]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sigma),
                                   _nchw_to_nhwc(fixture["ep1_sigma"]),
                                   rtol=1e-5, atol=1e-5)

    def test_entropy_parameters_k3_gmm(self, fixture):
        w, mus, sigmas = self._ep_apply(fixture, 3)
        # reference layout (B, K, M, H, W) -> ours (B, H, W, K, M)
        to_ours = lambda a: np.transpose(a, (0, 3, 4, 1, 2))
        np.testing.assert_allclose(np.asarray(w), to_ours(fixture["ep3_w"]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(mus), to_ours(fixture["ep3_mu"]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sigmas), to_ours(fixture["ep3_sigma"]),
                                   rtol=1e-5, atol=1e-5)
