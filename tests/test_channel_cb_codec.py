"""ChannelCheckerboardCodec — 2·G-pass parallel bitstreams for the
channel-conditional checkerboard family (kind 11).

Mirrors tests/test_checkerboard.py's codec coverage: exact round-trip
against the model's eval forward, rate ~ analytic, pad-code-crop, uint8
path, interleaved lanes (rate-neutral pure partition over 2·G blocks),
batch APIs byte-identical to singles, truncation/wrong-model errors."""

import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_image_compression_tpu.coding.codec import ChannelCheckerboardCodec
from neural_image_compression_tpu.models import ChannelCheckerboardHierarchical

KEY = jax.random.PRNGKey(0)


def _init(model, shape=(1, 64, 64, 3)):
    x = jnp.zeros(shape, jnp.float32)
    return model.init({"params": KEY, "noise": KEY}, x, training=False)["params"]


@pytest.fixture(scope="module")
def ccb_k1():
    model = ChannelCheckerboardHierarchical(latent_channels=16, K=1)
    return model, _init(model)


@pytest.fixture(scope="module")
def ccb_k3():
    model = ChannelCheckerboardHierarchical(latent_channels=16, K=3)
    return model, _init(model)


@pytest.mark.parametrize("fixture", ["ccb_k1", "ccb_k3"])
def test_roundtrip_exact(fixture, request):
    model, params = request.getfixturevalue(fixture)
    codec = ChannelCheckerboardCodec(model, {"params": params})
    x = jax.random.uniform(jax.random.PRNGKey(10), (1, 64, 64, 3))
    data = codec.compress(np.asarray(x))
    y_dec, z_dec = codec.decode_latents(data)

    out = model.apply({"params": params}, x, training=False)
    np.testing.assert_array_equal(z_dec, np.asarray(out["z_in"])[0])
    np.testing.assert_array_equal(y_dec, np.asarray(out["y_in"])[0])
    x_hat = codec.decompress(data)
    np.testing.assert_allclose(
        x_hat, np.clip(np.asarray(out["x_hat"]), 0, 1), atol=2e-5)


def test_rate_matches_analytic(ccb_k1):
    model, params = ccb_k1
    codec = ChannelCheckerboardCodec(model, {"params": params})
    x = jax.random.uniform(jax.random.PRNGKey(11), (1, 128, 128, 3))
    data = codec.compress(np.asarray(x))
    out = model.apply({"params": params}, x, training=False)
    analytic_bits = float(-(jnp.sum(out["logp_y"]) + jnp.sum(out["logp_z"]))
                          / jnp.log(2.0))
    stream_bits = (len(data) - struct.calcsize("<4sBBHHHHhhII")) * 8
    assert stream_bits < analytic_bits * 1.10 + 256
    assert stream_bits > analytic_bits * 0.90 - 256


def test_pad_code_crop(ccb_k1):
    model, params = ccb_k1
    codec = ChannelCheckerboardCodec(model, {"params": params})
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(12), (1, 70, 100, 3)),
                   np.float32)
    data = codec.compress(x)
    x_hat = codec.decompress(data)
    assert x_hat.shape == x.shape
    u8 = codec.decompress(data, as_uint8=True)
    assert u8.shape == x.shape and u8.dtype == np.uint8


def test_uint8_input_same_stream(ccb_k1):
    model, params = ccb_k1
    codec = ChannelCheckerboardCodec(model, {"params": params})
    u8 = np.asarray(jax.random.randint(jax.random.PRNGKey(13), (1, 64, 64, 3),
                                       0, 256), np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    assert codec.compress(u8) == codec.compress(f32)


def test_truncation_raises(ccb_k1):
    model, params = ccb_k1
    codec = ChannelCheckerboardCodec(model, {"params": params})
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(14), (1, 64, 64, 3)),
                   np.float32)
    data = codec.compress(x)
    with pytest.raises(ValueError):
        codec.decode_latents(data[:-3])


@pytest.mark.parametrize("fixture,n", [("ccb_k1", 2), ("ccb_k1", 4),
                                       ("ccb_k3", 3)])
def test_interleaved_streams_roundtrip(fixture, n, request):
    model, params = request.getfixturevalue(fixture)
    codec = ChannelCheckerboardCodec(model, {"params": params})
    x = jax.random.uniform(jax.random.PRNGKey(16), (1, 64, 128, 3))
    base = codec.compress(np.asarray(x))
    data = codec.compress(np.asarray(x), n_streams=n)
    assert len(data) <= len(base) + 8 * n + 16  # framing only
    y1, z1 = codec.decode_latents(base)
    yn, zn = codec.decode_latents(data)
    np.testing.assert_array_equal(y1, yn)
    np.testing.assert_array_equal(z1, zn)


def test_interleaved_truncation_raises(ccb_k1):
    model, params = ccb_k1
    codec = ChannelCheckerboardCodec(model, {"params": params})
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(17), (1, 64, 64, 3)),
                   np.float32)
    data = codec.compress(x, n_streams=3)
    with pytest.raises(ValueError):
        codec.decode_latents(data[:-3])


def test_batch_matches_single(ccb_k3):
    model, params = ccb_k3
    codec = ChannelCheckerboardCodec(model, {"params": params})
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


def test_batch_interleaved(ccb_k1):
    model, params = ccb_k1
    codec = ChannelCheckerboardCodec(model, {"params": params})
    xs = np.asarray(jax.random.uniform(jax.random.PRNGKey(19),
                                       (2, 64, 64, 3)), np.float32)
    streams = codec.compress_batch(xs, n_streams=2)
    for b in range(2):
        assert streams[b] == codec.compress(xs[b:b + 1], n_streams=2)
    recon = codec.decompress_batch(streams)
    for b in range(2):
        np.testing.assert_array_equal(recon[b:b + 1],
                                      codec.decompress(streams[b]))


def test_wrong_model_stream_raises(ccb_k1, ccb_k3):
    model1, params1 = ccb_k1
    model3, params3 = ccb_k3
    c1 = ChannelCheckerboardCodec(model1, {"params": params1})
    c3 = ChannelCheckerboardCodec(model3, {"params": params3})
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(15), (1, 64, 64, 3)),
                   np.float32)
    with pytest.raises(ValueError, match="K="):
        c3.decode_latents(c1.compress(x))


def test_foreign_kind_raises(ccb_k1):
    from neural_image_compression_tpu.coding.codec import CheckerboardCodec
    from neural_image_compression_tpu.models import CheckerboardHierarchical

    model, params = ccb_k1
    cb = CheckerboardHierarchical(latent_channels=16, K=1)
    cb_params = _init(cb)
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(20), (1, 64, 64, 3)),
                   np.float32)
    data = CheckerboardCodec(cb, {"params": cb_params}).compress(x)
    codec = ChannelCheckerboardCodec(model, {"params": params})
    with pytest.raises(ValueError, match="not a channel-checkerboard"):
        codec.decode_latents(data)
