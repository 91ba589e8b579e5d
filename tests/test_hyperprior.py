"""Mean-scale hyperprior family (models/hyperprior.py) + one-pass codec.

The load-bearing properties: (1) the entropy parameters depend on z ALONE
(the family's defining feature — no y feedback anywhere); (2) the EP net
contracts over 2M lanes (psi only), not the 4M context concat; (3) the real
bitstream round-trips exactly, its rate matches the analytic bits, and the
interleaved lanes are a rate-neutral pure partition; (4) the family plugs
into Trainer/config/CLI unchanged.
"""

import struct

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from neural_image_compression_tpu.coding.codec import (
    CheckerboardCodec, MeanScaleHyperpriorCodec,
)
from neural_image_compression_tpu.models import MeanScaleHyperprior
from neural_image_compression_tpu.train.loss import rd_loss

KEY = jax.random.PRNGKey(0)


def _init(model, shape=(1, 64, 64, 3)):
    x = jnp.zeros(shape, jnp.float32)
    return model.init({"params": KEY, "noise": KEY}, x, training=False)["params"]


@pytest.fixture(scope="module")
def hp_k1():
    model = MeanScaleHyperprior(latent_channels=8, K=1)
    return model, _init(model)


@pytest.fixture(scope="module")
def hp_k3():
    model = MeanScaleHyperprior(latent_channels=8, K=3)
    return model, _init(model)


def test_forward_contract(hp_k1, hp_k3):
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    for (model, params), extra in ((hp_k1, ("mu", "sigma")),
                                   (hp_k3, ("weights", "mus", "sigmas"))):
        out = model.apply({"params": params}, x, training=False)
        for k in ("x_hat", "y", "y_in", "z", "z_in", "p_y", "logp_y",
                  "p_z", "logp_z") + extra:
            assert k in out, k
        assert out["x_hat"].shape == x.shape
        assert np.isfinite(np.asarray(out["x_hat"])).all()
        out_t = model.apply({"params": params}, x, training=True,
                            rngs={"noise": jax.random.PRNGKey(2)})
        assert np.isfinite(float(jnp.sum(out_t["logp_y"])))


def test_entropy_params_depend_on_z_alone(hp_k1):
    """The defining property: y entropy params are a function of z_in only.
    The forward's params must equal entropy_params_from_hyper(z_in), and
    perturbing y (without touching z) must not change them."""
    model, params = hp_k1
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    out = model.apply({"params": params}, x, training=False)
    mu2, sigma2 = model.apply({"params": params}, out["z_in"],
                              method=lambda m, z: m.entropy_params_from_hyper(z))
    np.testing.assert_array_equal(np.asarray(out["mu"]), np.asarray(mu2))
    np.testing.assert_array_equal(np.asarray(out["sigma"]), np.asarray(sigma2))


def test_ep_net_contracts_over_2m_lanes(hp_k1):
    """TPU-first shape check: the first EP GEMM contracts over 2M input
    lanes (psi only), not the joint family's 4M context+hyper concat."""
    model, params = hp_k1
    # find the conv kernels' input widths (HWIO kernels are rank 4)
    widths = [np.asarray(leaf).shape[2]
              for leaf in jax.tree_util.tree_leaves(params["entropy_parameters"])
              if np.asarray(leaf).ndim == 4]
    assert 2 * model.latent_channels in widths
    assert 4 * model.latent_channels not in widths


def test_ep_input_width_validated():
    from neural_image_compression_tpu.models.parameters import EntropyParameters

    ep = EntropyParameters(latent_channels=8, hyper_latent_channels=8, K=1,
                           input_channels=16)
    bad = jnp.zeros((1, 4, 4, 32))
    with pytest.raises(ValueError, match="declared input_channels"):
        ep.init(KEY, bad)


def test_training_step_runs_and_loss_decreases(hp_k1):
    model, _ = hp_k1
    params = _init(model)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3))

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            out = model.apply({"params": p}, x, training=True,
                              rngs={"noise": rng})
            return rd_loss(out, x, 0.01)["loss"]
        loss, g = jax.value_and_grad(loss_fn)(params)
        u, opt_state2 = tx.update(g, opt_state)
        return optax.apply_updates(params, u), opt_state2, loss

    losses = []
    for i in range(20):
        params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


# --- codec ----------------------------------------------------------------

@pytest.mark.parametrize("fixture", ["hp_k1", "hp_k3"])
def test_codec_roundtrip_exact(fixture, request):
    model, params = request.getfixturevalue(fixture)
    codec = MeanScaleHyperpriorCodec(model, {"params": params})
    x = jax.random.uniform(jax.random.PRNGKey(10), (1, 64, 64, 3))
    data = codec.compress(np.asarray(x))
    y_dec, z_dec = codec.decode_latents(data)

    out = model.apply({"params": params}, x, training=False)
    np.testing.assert_array_equal(z_dec, np.asarray(out["z_in"])[0])
    np.testing.assert_array_equal(y_dec, np.asarray(out["y_in"])[0])
    x_hat = codec.decompress(data)
    np.testing.assert_allclose(
        x_hat, np.clip(np.asarray(out["x_hat"]), 0, 1), atol=2e-5)


def test_codec_rate_matches_analytic(hp_k1):
    model, params = hp_k1
    codec = MeanScaleHyperpriorCodec(model, {"params": params})
    x = jax.random.uniform(jax.random.PRNGKey(11), (1, 128, 128, 3))
    data = codec.compress(np.asarray(x))
    out = model.apply({"params": params}, x, training=False)
    analytic_bits = float(-(jnp.sum(out["logp_y"]) + jnp.sum(out["logp_z"]))
                          / jnp.log(2.0))
    stream_bits = (len(data) - struct.calcsize("<4sBBHHHHhhII")) * 8
    assert stream_bits < analytic_bits * 1.10 + 256
    assert stream_bits > analytic_bits * 0.90 - 256


def test_codec_pad_code_crop(hp_k1):
    model, params = hp_k1
    codec = MeanScaleHyperpriorCodec(model, {"params": params})
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(12), (1, 70, 100, 3)),
                   np.float32)
    data = codec.compress(x)
    x_hat = codec.decompress(data)
    assert x_hat.shape == x.shape
    u8 = codec.decompress(data, as_uint8=True)
    assert u8.shape == x.shape and u8.dtype == np.uint8


def test_codec_uint8_input_same_stream(hp_k1):
    model, params = hp_k1
    codec = MeanScaleHyperpriorCodec(model, {"params": params})
    u8 = np.asarray(jax.random.randint(jax.random.PRNGKey(13), (1, 64, 64, 3),
                                       0, 256), np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    assert codec.compress(u8) == codec.compress(f32)


def test_codec_truncation_raises(hp_k1):
    model, params = hp_k1
    codec = MeanScaleHyperpriorCodec(model, {"params": params})
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(14), (1, 64, 64, 3)),
                   np.float32)
    data = codec.compress(x)
    with pytest.raises(ValueError):
        codec.decode_latents(data[:-3])
    data_n = codec.compress(x, n_streams=3)
    with pytest.raises(ValueError):
        codec.decode_latents(data_n[:-3])


def test_truncation_sweep_raises_everywhere(hp_k1):
    """Every truncation point of a hyperprior bitstream must raise (decoder
    final-state invariant), never return silently-wrong latents."""
    model, params = hp_k1
    codec = MeanScaleHyperpriorCodec(model, {"params": params})
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(21), (1, 64, 64, 3)),
                   np.float32)
    data = codec.compress(x)
    step = max(1, len(data) // 16)
    for cut in range(len(data) - 1, 26, -step):  # keep the 26-byte header
        with pytest.raises(ValueError):
            codec.decompress(data[:cut])


@pytest.mark.parametrize("fixture,n", [("hp_k1", 2), ("hp_k1", 4),
                                       ("hp_k3", 3)])
def test_codec_interleaved_streams_roundtrip(fixture, n, request):
    model, params = request.getfixturevalue(fixture)
    codec = MeanScaleHyperpriorCodec(model, {"params": params})
    x = jax.random.uniform(jax.random.PRNGKey(16), (1, 64, 128, 3))
    base = codec.compress(np.asarray(x))
    data = codec.compress(np.asarray(x), n_streams=n)
    assert len(data) <= len(base) + 8 * n + 16  # framing-only rate cost
    y1, z1 = codec.decode_latents(base)
    yn, zn = codec.decode_latents(data)
    np.testing.assert_array_equal(y1, yn)
    np.testing.assert_array_equal(z1, zn)


def test_codec_batch_matches_single(hp_k3):
    model, params = hp_k3
    codec = MeanScaleHyperpriorCodec(model, {"params": params})
    xs = np.asarray(jax.random.uniform(jax.random.PRNGKey(18),
                                       (3, 64, 64, 3)), np.float32)
    streams = codec.compress_batch(xs)
    for b in range(3):
        assert streams[b] == codec.compress(xs[b:b + 1])
    recon = codec.decompress_batch(streams)
    for b in range(3):
        np.testing.assert_array_equal(recon[b:b + 1],
                                      codec.decompress(streams[b]))
    u8 = codec.decompress_batch(streams, as_uint8=True)
    assert u8.dtype == np.uint8 and u8.shape == (3, 64, 64, 3)


def test_codec_wrong_model_stream_raises(hp_k1, hp_k3):
    model1, params1 = hp_k1
    model3, params3 = hp_k3
    c1 = MeanScaleHyperpriorCodec(model1, {"params": params1})
    c3 = MeanScaleHyperpriorCodec(model3, {"params": params3})
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(15), (1, 64, 64, 3)),
                   np.float32)
    with pytest.raises(ValueError, match="K="):
        c3.decode_latents(c1.compress(x))


def test_codec_kind_mismatch_raises(hp_k1):
    """A hyperprior stream is rejected by the checkerboard codec and vice
    versa (kind 9 vs kind 7), not silently mis-decoded."""
    model, params = hp_k1
    hp_codec = MeanScaleHyperpriorCodec(model, {"params": params})
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(20), (1, 64, 64, 3)),
                   np.float32)
    data = hp_codec.compress(x)

    from neural_image_compression_tpu.models import CheckerboardHierarchical
    cb_model = CheckerboardHierarchical(latent_channels=8, K=1)
    cb = CheckerboardCodec(cb_model, {"params": _init(cb_model)})
    with pytest.raises(ValueError, match="checkerboard"):
        cb.decode_latents(data)
    with pytest.raises(ValueError, match="hyperprior"):
        hp_codec.decode_latents(cb.compress(x))


def test_build_model_and_trainer(tmp_path):
    from neural_image_compression_tpu.config import ModelConfig, build_model
    from neural_image_compression_tpu.train import Trainer

    model = build_model(ModelConfig(name="hyperprior", latent_channels=8,
                                    K=1))
    assert isinstance(model, MeanScaleHyperprior)
    loader = list(np.random.RandomState(0).rand(2, 1, 64, 64, 3)
                  .astype(np.float32))
    trainer = Trainer(model, loader, max_steps=3,
                      log_dir=str(tmp_path / "runs"),
                      checkpoint_path=None)
    trainer.train()
    assert trainer.step == 3
