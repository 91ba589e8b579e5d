"""Model-assembly contract tests: output keys, shapes, quantization modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_image_compression_tpu.models import (
    FactorizedPrior, HierarchicalMixtureResidual, JointAutoregressiveHierarchical,
    ScalableImageCoding,
)

KEY = jax.random.PRNGKey(0)


def _init_apply(model, x, training=True):
    vs = model.init({"params": KEY, "noise": KEY}, x, training=training)
    rngs = {"noise": jax.random.PRNGKey(7)} if training else None
    out = model.apply(vs, x, training=training, rngs=rngs)
    return vs, out


class TestJointAR:
    @pytest.mark.parametrize("K", [1, 3])
    def test_output_contract(self, K):
        x = jax.random.uniform(KEY, (2, 64, 64, 3))
        model = JointAutoregressiveHierarchical(latent_channels=16, K=K)
        _, out = _init_apply(model, x)
        base_keys = {"x_hat", "y", "y_in", "z", "z_in", "p_z", "logp_z",
                     "p_y", "logp_y", "training"}
        param_keys = {"mu", "sigma"} if K == 1 else {"weights", "mus", "sigmas"}
        assert base_keys | param_keys <= set(out.keys())
        assert out["x_hat"].shape == x.shape
        assert out["y"].shape == (2, 4, 4, 16)       # x16 down (SURVEY §2.2)
        assert out["z"].shape == (2, 1, 1, 16)       # x64 down
        if K == 1:
            assert out["mu"].shape == (2, 4, 4, 16)
            assert np.all(np.asarray(out["sigma"]) > 0)
        else:
            assert out["weights"].shape == (2, 4, 4, 3, 16)
            w_sum = np.asarray(out["weights"]).sum(axis=-2)
            np.testing.assert_allclose(w_sum, 1.0, atol=1e-5)
            assert np.all(np.asarray(out["sigmas"]) > 0)

    def test_eval_rounds(self):
        x = jax.random.uniform(KEY, (1, 64, 64, 3))
        model = JointAutoregressiveHierarchical(latent_channels=8)
        vs, _ = _init_apply(model, x)
        out = model.apply(vs, x, training=False)
        y_in = np.asarray(out["y_in"])
        np.testing.assert_array_equal(y_in, np.round(y_in))
        z_in = np.asarray(out["z_in"])
        np.testing.assert_array_equal(z_in, np.round(z_in))

    def test_train_noise_within_half(self):
        x = jax.random.uniform(KEY, (1, 64, 64, 3))
        model = JointAutoregressiveHierarchical(latent_channels=8)
        vs, out = _init_apply(model, x, training=True)
        delta = np.asarray(out["y_in"] - out["y"])
        assert np.all(np.abs(delta) <= 0.5)
        assert delta.std() > 0.1  # actually noisy

    def test_likelihoods_bounded(self):
        x = jax.random.uniform(KEY, (1, 64, 64, 3))
        model = JointAutoregressiveHierarchical(latent_channels=8, K=2)
        _, out = _init_apply(model, x)
        for k in ("p_y", "p_z"):
            p = np.asarray(out[k])
            assert np.all(p >= 1e-9) and np.all(p <= 1.0 + 1e-6)

    def test_residual_variant(self):
        x = jax.random.uniform(KEY, (1, 64, 64, 3))
        model = HierarchicalMixtureResidual(latent_channels=8, K=2)
        _, out = _init_apply(model, x)
        assert out["x_hat"].shape == x.shape
        assert out["y"].shape == (1, 4, 4, 8)

    def test_deterministic_eval(self):
        x = jax.random.uniform(KEY, (1, 64, 64, 3))
        model = JointAutoregressiveHierarchical(latent_channels=8)
        vs, _ = _init_apply(model, x)
        o1 = model.apply(vs, x, training=False)
        o2 = model.apply(vs, x, training=False)
        np.testing.assert_array_equal(np.asarray(o1["x_hat"]), np.asarray(o2["x_hat"]))


class TestFactorizedPrior:
    def test_contract(self):
        x = jax.random.uniform(KEY, (2, 64, 64, 3))
        model = FactorizedPrior(latent_channels=8)
        _, out = _init_apply(model, x)
        assert out["x_hat"].shape == x.shape
        # z placeholders carry zero rate
        assert float(jnp.sum(out["logp_z"])) == 0.0


class TestScalable:
    @pytest.mark.parametrize("K", [1, 2])
    def test_contract(self, K):
        x = jax.random.uniform(KEY, (1, 64, 64, 3))
        model = ScalableImageCoding(latent_channels=24, base_channels=16, K=K)
        _, out = _init_apply(model, x)
        assert out["y1"].shape == (1, 4, 4, 16)
        assert out["y2"].shape == (1, 4, 4, 8)
        assert out["F_tilde"].shape[1:3] == (8, 8)  # LST upsamples x2
        expected = ({"mu1", "sigma1", "mu2", "sigma2"} if K == 1 else
                    {"weights1", "mus1", "sigmas1", "weights2", "mus2", "sigmas2"})
        assert expected <= set(out.keys())
        for k in ("p_y1", "p_y2", "p_z"):
            assert np.all(np.asarray(out[k]) >= 1e-9)

    def test_split_consistent(self):
        x = jax.random.uniform(KEY, (1, 64, 64, 3))
        model = ScalableImageCoding(latent_channels=24, base_channels=16)
        vs, _ = _init_apply(model, x)
        out = model.apply(vs, x, training=False)
        recon = jnp.concatenate([out["y1"], out["y2"]], axis=-1)
        np.testing.assert_array_equal(np.asarray(recon), np.asarray(out["y_in"]))


class TestShapeValidation:
    def test_joint_ar_rejects_odd_size(self):
        model = JointAutoregressiveHierarchical(latent_channels=8)
        x = jnp.zeros((1, 96, 80, 3))
        with pytest.raises(ValueError, match="multiples of 64"):
            model.init({"params": KEY, "noise": KEY}, x, training=False)

    def test_scalable_rejects_odd_size(self):
        model = ScalableImageCoding(latent_channels=12, base_channels=8)
        x = jnp.zeros((1, 100, 64, 3))
        with pytest.raises(ValueError, match="multiples of 64"):
            model.init({"params": KEY, "noise": KEY}, x, training=False)

    def test_factorized_rejects_odd_size(self):
        model = FactorizedPrior(latent_channels=8)
        x = jnp.zeros((1, 30, 32, 3))
        with pytest.raises(ValueError, match="multiples of 16"):
            model.init({"params": KEY, "noise": KEY}, x, training=False)

    def test_factorized_accepts_mult16(self):
        model = FactorizedPrior(latent_channels=8)
        x = jnp.zeros((1, 48, 80, 3))
        vs = model.init({"params": KEY, "noise": KEY}, x, training=False)
        out = model.apply(vs, x, training=False)
        assert out["x_hat"].shape == x.shape
