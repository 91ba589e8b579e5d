"""Serving export (serving.py): StableHLO artifact round-trip.

The artifact must be self-contained: deserialize from bytes alone (no model
code, no params) and reproduce the live eval forward exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_image_compression_tpu import serving
from neural_image_compression_tpu.models import (
    FactorizedPrior, JointAutoregressiveHierarchical,
)


def _init(model, shape=(1, 64, 64, 3)):
    key = jax.random.PRNGKey(0)
    x = jnp.zeros(shape, jnp.float32)
    return model.init({"params": key, "noise": key}, x, training=False)["params"]


@pytest.fixture(scope="module")
def joint_small():
    model = JointAutoregressiveHierarchical(latent_channels=8, K=2)
    return model, _init(model)


def test_roundtrip_matches_live_forward(tmp_path, joint_small):
    model, params = joint_small
    exported = serving.export_model(model, params, 64, 64, batch=1)
    path = str(tmp_path / "flagship.shlo")
    serving.save_exported(exported, path)

    loaded = serving.load_exported(path)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3), jnp.float32)
    got = loaded.call(x)
    want = serving.make_serving_fn(model, params)(x)
    np.testing.assert_allclose(np.asarray(got["x_hat"]),
                               np.asarray(want["x_hat"]), rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got["bpp_total"]),
                               np.asarray(want["bpp_total"]), rtol=1e-6)
    assert np.asarray(got["bpp_total"]).shape == (1,)  # per-image, not mean
    np.testing.assert_allclose(
        np.asarray(got["bpp_y"]) + np.asarray(got["bpp_z"]),
        np.asarray(got["bpp_total"]), rtol=1e-6)


def test_symbolic_batch_serves_any_b(joint_small):
    model, params = joint_small
    exported = serving.export_model(model, params, 64, 64)  # symbolic B
    data = exported.serialize()
    loaded = jax.export.deserialize(bytearray(data))
    for b in (1, 3):
        x = jax.random.uniform(jax.random.PRNGKey(b), (b, 64, 64, 3),
                               jnp.float32)
        out = loaded.call(x)
        assert out["x_hat"].shape == (b, 64, 64, 3)
        assert out["bpp_total"].shape == (b,)
    # batch entries are independent (conv model, no cross-image coupling)
    x = jax.random.uniform(jax.random.PRNGKey(7), (2, 64, 64, 3), jnp.float32)
    both = loaded.call(x)
    solo = loaded.call(x[:1])
    np.testing.assert_allclose(np.asarray(both["bpp_total"])[0],
                               np.asarray(solo["bpp_total"])[0], rtol=1e-5)


def test_symbolic_batch_wide_model():
    """Regression: with latent_channels >= 22 the deconv auto-lowering's
    cout>=32 branch compares the batch dim; a symbolic batch must not make
    export raise InconclusiveDimensionOperation (ops/conv.py)."""
    model = JointAutoregressiveHierarchical(latent_channels=32, K=1)
    params = _init(model)
    exported = serving.export_model(model, params, 64, 64)  # symbolic B
    out = exported.call(jnp.zeros((2, 64, 64, 3), jnp.float32))
    assert out["x_hat"].shape == (2, 64, 64, 3)


def test_factorized_family_and_zero_z_rate(tmp_path):
    model = FactorizedPrior(latent_channels=8)
    params = _init(model)
    exported = serving.export_model(model, params, 64, 64, batch=1)
    out = exported.call(jnp.ones((1, 64, 64, 3), jnp.float32) * 0.5)
    assert float(np.asarray(out["bpp_z"])[0]) == 0.0
    assert float(np.asarray(out["bpp_total"])[0]) > 0.0


def test_hyperprior_family_exports(tmp_path):
    from neural_image_compression_tpu.models import MeanScaleHyperprior

    model = MeanScaleHyperprior(latent_channels=8, K=1)
    params = _init(model)
    exported = serving.export_model(model, params, 64, 64, batch=1)
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 64, 64, 3), jnp.float32)
    out = exported.call(x)
    want = serving.make_serving_fn(model, params)(x)
    np.testing.assert_allclose(np.asarray(out["x_hat"]),
                               np.asarray(want["x_hat"]), atol=1e-5)
    assert float(np.asarray(out["bpp_z"])[0]) > 0.0


def test_channel_cb_family_exports(tmp_path):
    from neural_image_compression_tpu.models import (
        ChannelCheckerboardHierarchical,
    )

    model = ChannelCheckerboardHierarchical(latent_channels=16, K=1)
    params = _init(model)
    exported = serving.export_model(model, params, 64, 64, batch=1)
    x = jax.random.uniform(jax.random.PRNGKey(8), (1, 64, 64, 3), jnp.float32)
    out = exported.call(x)
    want = serving.make_serving_fn(model, params)(x)
    np.testing.assert_allclose(np.asarray(out["x_hat"]),
                               np.asarray(want["x_hat"]), atol=1e-5)
    assert float(np.asarray(out["bpp_y"])[0]) > 0.0


def test_bad_resolution_raises(joint_small):
    model, params = joint_small
    with pytest.raises(ValueError, match="multiples of 64"):
        serving.export_model(model, params, 100, 64)


def test_bpp_matches_rd_loss(joint_small):
    """Per-image bpp from the serving fn == the (batch-1) rd_loss bpp."""
    from neural_image_compression_tpu.train.loss import rd_loss

    model, params = joint_small
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3), jnp.float32)
    out = model.apply({"params": params}, x, training=False)
    want = rd_loss(out, x, 0.005)
    got = serving.make_serving_fn(model, params)(x)
    np.testing.assert_allclose(float(got["bpp_total"][0]),
                               float(want["bpp_total"]), rtol=1e-5)
