"""Checkerboard context model + two-pass codec.

The load-bearing properties: (1) causality — anchor params depend on the
hyperprior alone, non-anchor params on anchors only; (2) the one-pass
training forward is pointwise-equal to the codec's two decode passes;
(3) the real bitstream round-trips exactly and its rate matches the
analytic bits; (4) the family plugs into Trainer/config/CLI unchanged."""

import struct

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from neural_image_compression_tpu.coding.codec import CheckerboardCodec
from neural_image_compression_tpu.models import (
    CheckerboardHierarchical, checkerboard_mask,
)
from neural_image_compression_tpu.train.loss import rd_loss

KEY = jax.random.PRNGKey(0)


def _init(model, shape=(1, 64, 64, 3)):
    x = jnp.zeros(shape, jnp.float32)
    return model.init({"params": KEY, "noise": KEY}, x, training=False)["params"]


@pytest.fixture(scope="module")
def cb_k1():
    model = CheckerboardHierarchical(latent_channels=8, K=1)
    return model, _init(model)


@pytest.fixture(scope="module")
def cb_k3():
    model = CheckerboardHierarchical(latent_channels=8, K=3)
    return model, _init(model)


def test_mask_convention():
    m = checkerboard_mask(3, 4)
    assert m[0, 0] and not m[0, 1] and m[1, 1] and not m[1, 0]
    assert m.sum() + (~m).sum() == 12


def test_forward_contract(cb_k1, cb_k3):
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    for (model, params), extra in ((cb_k1, ("mu", "sigma")),
                                   (cb_k3, ("weights", "mus", "sigmas"))):
        out = model.apply({"params": params}, x, training=False)
        for k in ("x_hat", "y", "y_in", "z", "z_in", "p_y", "logp_y",
                  "p_z", "logp_z") + extra:
            assert k in out, k
        assert out["x_hat"].shape == x.shape
        assert np.isfinite(np.asarray(out["x_hat"])).all()
        # training forward with noise rng
        out_t = model.apply({"params": params}, x, training=True,
                            rngs={"noise": KEY})
        assert np.isfinite(np.asarray(out_t["p_y"])).all()


def test_anchor_params_ignore_all_latents(cb_k1):
    """Anchor-position params depend on z only: replacing y entirely leaves
    the params at anchors unchanged (the decodability condition for pass 1)."""
    model, params = cb_k1
    rng = jax.random.PRNGKey(2)
    y1 = jnp.round(jax.random.normal(rng, (1, 8, 8, 8)) * 3)
    y2 = jnp.round(jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 8)) * 3)
    z = jnp.round(jax.random.normal(jax.random.PRNGKey(4), (1, 2, 2, 8)) * 2)

    def ep(y):
        return model.apply({"params": params}, y, z,
                           method=lambda m, a, b: m.entropy_params_from_latents(a, b))

    mu1, sig1 = ep(y1)
    mu2, sig2 = ep(y2)
    am = checkerboard_mask(8, 8)
    np.testing.assert_array_equal(np.asarray(mu1)[0][am], np.asarray(mu2)[0][am])
    np.testing.assert_array_equal(np.asarray(sig1)[0][am], np.asarray(sig2)[0][am])
    # and non-anchor params DO react to the anchors (the context is live)
    assert not np.array_equal(np.asarray(mu1)[0][~am], np.asarray(mu2)[0][~am])


def test_nonanchor_params_ignore_nonanchor_latents(cb_k1):
    """Non-anchor params depend on the ANCHOR latents only: perturbing the
    non-anchor half of y changes nothing (the decodability condition for
    pass 2)."""
    model, params = cb_k1
    y = jnp.round(jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 8)) * 3)
    z = jnp.round(jax.random.normal(jax.random.PRNGKey(6), (1, 2, 2, 8)) * 2)
    am = checkerboard_mask(8, 8)
    y_perturbed = jnp.where(jnp.asarray(am)[None, :, :, None], y, y + 7.0)

    def ep(yv):
        return model.apply({"params": params}, yv, z,
                           method=lambda m, a, b: m.entropy_params_from_latents(a, b))

    mu1, _ = ep(y)
    mu2, _ = ep(y_perturbed)
    np.testing.assert_array_equal(np.asarray(mu1)[0][~am],
                                  np.asarray(mu2)[0][~am])


@pytest.mark.parametrize("fixture", ["cb_k1", "cb_k3"])
def test_two_pass_equals_training_forward(fixture, request):
    """anchor_pass/nonanchor_pass (the codec programs) reproduce the one-pass
    forward's params at their respective positions (EP is pointwise)."""
    model, params = request.getfixturevalue(fixture)
    y = jnp.round(jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 8)) * 3)
    z = jnp.round(jax.random.normal(jax.random.PRNGKey(8), (1, 2, 2, 8)) * 2)
    am = checkerboard_mask(8, 8)

    full = model.apply({"params": params}, y, z,
                       method=lambda m, a, b: m.entropy_params_from_latents(a, b))
    out_a = model.apply({"params": params}, z,
                        method=lambda m, zz: m.anchor_pass(zz))
    psi, pa = out_a[0], out_a[1:]
    y_anchor = jnp.where(jnp.asarray(am)[None, :, :, None], y, 0.0)
    pna = model.apply({"params": params}, psi, y_anchor,
                      method=lambda m, p, ya: m.nonanchor_pass(p, ya))

    for want, got_a, got_na in zip(full, pa, pna):
        w = np.asarray(want)[0]
        np.testing.assert_allclose(np.asarray(got_a)[0][am], w[am],
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(got_na)[0][~am], w[~am],
                                   rtol=1e-6, atol=1e-7)


def test_training_step_runs_and_loss_finite(cb_k1):
    model, params = cb_k1
    from neural_image_compression_tpu.parallel.train_step import make_train_step

    # the train step DONATES params; copy so the module-scoped fixture's
    # buffers survive for the tests that run after this one
    params = jax.tree_util.tree_map(jnp.array, params)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, rd_loss, 0.01)
    x = jax.random.uniform(jax.random.PRNGKey(9), (2, 64, 64, 3))
    losses = []
    for i in range(5):
        params, opt_state, m = step(params, opt_state, x, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    # the context conv receives gradients
    g0 = np.asarray(params["context_model"]["Conv2d_0"]["kernel"])
    assert not np.allclose(g0, 0)


@pytest.mark.parametrize("fixture", ["cb_k1", "cb_k3"])
def test_codec_roundtrip_exact(fixture, request):
    model, params = request.getfixturevalue(fixture)
    codec = CheckerboardCodec(model, {"params": params})
    x = jax.random.uniform(jax.random.PRNGKey(10), (1, 64, 64, 3))
    data = codec.compress(np.asarray(x))
    y_dec, z_dec = codec.decode_latents(data)

    out = model.apply({"params": params}, x, training=False)
    np.testing.assert_array_equal(z_dec, np.asarray(out["z_in"])[0])
    np.testing.assert_array_equal(y_dec, np.asarray(out["y_in"])[0])
    x_hat = codec.decompress(data)
    np.testing.assert_allclose(
        x_hat, np.clip(np.asarray(out["x_hat"]), 0, 1), atol=2e-5)


def test_codec_rate_matches_analytic(cb_k1):
    """Stream bits ~ analytic -log2 p bits (within the rANS table quantization
    + alphabet-cap slack on an untrained model)."""
    model, params = cb_k1
    codec = CheckerboardCodec(model, {"params": params})
    x = jax.random.uniform(jax.random.PRNGKey(11), (1, 128, 128, 3))
    data = codec.compress(np.asarray(x))
    out = model.apply({"params": params}, x, training=False)
    analytic_bits = float(-(jnp.sum(out["logp_y"]) + jnp.sum(out["logp_z"]))
                          / jnp.log(2.0))
    stream_bits = (len(data) - struct.calcsize("<4sBBHHHHhhII")) * 8
    assert stream_bits < analytic_bits * 1.10 + 256
    assert stream_bits > analytic_bits * 0.90 - 256


def test_codec_pad_code_crop(cb_k1):
    """Arbitrary (non-multiple-of-64) sizes round-trip via pad-code-crop."""
    model, params = cb_k1
    codec = CheckerboardCodec(model, {"params": params})
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(12), (1, 70, 100, 3)),
                   np.float32)
    data = codec.compress(x)
    x_hat = codec.decompress(data)
    assert x_hat.shape == x.shape
    u8 = codec.decompress(data, as_uint8=True)
    assert u8.shape == x.shape and u8.dtype == np.uint8


def test_codec_uint8_input_same_stream(cb_k1):
    model, params = cb_k1
    codec = CheckerboardCodec(model, {"params": params})
    u8 = np.asarray(jax.random.randint(jax.random.PRNGKey(13), (1, 64, 64, 3),
                                       0, 256), np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    assert codec.compress(u8) == codec.compress(f32)


def test_codec_truncation_raises(cb_k1):
    model, params = cb_k1
    codec = CheckerboardCodec(model, {"params": params})
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(14), (1, 64, 64, 3)),
                   np.float32)
    data = codec.compress(x)
    with pytest.raises(ValueError):
        codec.decode_latents(data[:-3])


@pytest.mark.parametrize("fixture,n", [("cb_k1", 2), ("cb_k1", 4),
                                       ("cb_k3", 3)])
def test_codec_interleaved_streams_roundtrip(fixture, n, request):
    """n_streams lanes are a pure partition of each pass: exact round-trip,
    rate-neutral up to the ~8-byte/lane framing."""
    model, params = request.getfixturevalue(fixture)
    codec = CheckerboardCodec(model, {"params": params})
    x = jax.random.uniform(jax.random.PRNGKey(16), (1, 64, 128, 3))
    base = codec.compress(np.asarray(x))
    data = codec.compress(np.asarray(x), n_streams=n)
    # rate-neutral: framing only (4-byte length word + <=4-byte rANS tail
    # per extra lane, small constant slack)
    assert len(data) <= len(base) + 8 * n + 16
    y1, z1 = codec.decode_latents(base)
    yn, zn = codec.decode_latents(data)
    np.testing.assert_array_equal(y1, yn)
    np.testing.assert_array_equal(z1, zn)


def test_codec_interleaved_truncation_raises(cb_k1):
    model, params = cb_k1
    codec = CheckerboardCodec(model, {"params": params})
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(17), (1, 64, 64, 3)),
                   np.float32)
    data = codec.compress(x, n_streams=3)
    with pytest.raises(ValueError):
        codec.decode_latents(data[:-3])


def test_codec_batch_matches_single(cb_k3):
    """compress_batch streams are byte-identical to per-image compress();
    decompress_batch reconstructions equal per-image decompress()."""
    model, params = cb_k3
    codec = CheckerboardCodec(model, {"params": params})
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
    for b in range(3):
        np.testing.assert_array_equal(
            u8[b:b + 1], codec.decompress(streams[b], as_uint8=True))


def test_codec_batch_interleaved(cb_k1):
    model, params = cb_k1
    codec = CheckerboardCodec(model, {"params": params})
    xs = np.asarray(jax.random.uniform(jax.random.PRNGKey(19),
                                       (2, 64, 64, 3)), np.float32)
    streams = codec.compress_batch(xs, n_streams=2)
    for b in range(2):
        assert streams[b] == codec.compress(xs[b:b + 1], n_streams=2)
    recon = codec.decompress_batch(streams)
    for b in range(2):
        np.testing.assert_array_equal(recon[b:b + 1],
                                      codec.decompress(streams[b]))


def test_codec_wrong_model_stream_raises(cb_k1, cb_k3):
    model1, params1 = cb_k1
    model3, params3 = cb_k3
    c1 = CheckerboardCodec(model1, {"params": params1})
    c3 = CheckerboardCodec(model3, {"params": params3})
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(15), (1, 64, 64, 3)),
                   np.float32)
    with pytest.raises(ValueError, match="K="):
        c3.decode_latents(c1.compress(x))


def test_build_model_and_trainer(tmp_path):
    from neural_image_compression_tpu.config import ModelConfig, build_model
    from neural_image_compression_tpu.train import Trainer

    model = build_model(ModelConfig(name="checkerboard", latent_channels=8,
                                    K=1))
    assert isinstance(model, CheckerboardHierarchical)
    loader = list(np.random.RandomState(0).rand(2, 1, 64, 64, 3)
                  .astype(np.float32))
    trainer = Trainer(model, loader, max_steps=2,
                      log_dir=str(tmp_path / "runs"), checkpoint_path=None)
    trainer.train()
    assert trainer.step == 2
