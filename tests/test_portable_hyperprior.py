"""Portable (cross-machine deterministic) streams for the HYPERPRIOR
family (coding/portable.py portable_hp_* + ar_portable.cc arport_*_hp +
codec.py MeanScaleHyperpriorCodec kind 10).

Mirrors tests/test_portable_checkerboard.py: the numpy and C++
implementations must produce bit-identical streams in both directions given
the same card, the card records its family, and the end-to-end codec path
round-trips with the hash fail-fast. The hyperprior card (family=2) reuses
the wavefront card's entire integer spec minus the context: ctx/ep1_phi are
EMPTY (the EP layer-1 weight consumes psi alone) and every position's
parameters come from params_from_acc — the checkerboard anchor-pass math
applied to the whole grid.
"""

import numpy as np
import pytest

import jax

from neural_image_compression_tpu.coding.codec import MeanScaleHyperpriorCodec
from neural_image_compression_tpu.coding.portable import (
    PortableCard, portable_ar_encode, portable_cb_encode,
    portable_hp_decode, portable_hp_encode,
)
from neural_image_compression_tpu.models import MeanScaleHyperprior

KEY = jax.random.PRNGKey(0)


def _setup(K, M=8):
    model = MeanScaleHyperprior(latent_channels=M, K=K)
    x = jax.random.uniform(KEY, (1, 64, 128, 3))
    variables = {"params": model.init({"params": KEY, "noise": KEY}, x,
                                      training=False)["params"]}
    return model, variables


@pytest.fixture(scope="module", params=[1, 3], ids=["K1", "K3"])
def rig(request):
    K = request.param
    model, variables = _setup(K)
    card = PortableCard.build(model, variables, zmin=-32, zmax=32,
                              family="hyperprior")
    return model, variables, card, K


def test_card_is_context_free(rig):
    _, _, card, _ = rig
    assert card.family == 2
    assert card.ctx.wq.size == 0
    assert card.ep1_phi.wq.size == 0
    # the psi half carries the full EP layer-1 weight (2M input lanes)
    assert card.ep1_psi.wq.shape[0] == 2 * card.M
    # params_from_acc's requant shift must be the psi scale
    assert card.ep1_phi.sw == card.ep1_psi.sw


def test_native_and_numpy_streams_bit_identical(rig):
    """The cross-implementation contract, both directions."""
    _, _, card, _ = rig
    rng = np.random.RandomState(1)
    h, w = 6, 10
    y_q = rng.randint(-9, 10, (h, w, card.M)).astype(np.float32)
    z_q = rng.randint(-4, 5, (2, 3, card.M)).astype(np.float32)
    psi_fix = card.hyper_forward(z_q)[:h, :w]

    s_py = portable_hp_encode(card, y_q, psi_fix, native=False)
    s_cc = portable_hp_encode(card, y_q, psi_fix, native=True)
    assert s_py == s_cc
    np.testing.assert_array_equal(
        portable_hp_decode(card, s_cc, psi_fix, h, w, native=False), y_q)
    np.testing.assert_array_equal(
        portable_hp_decode(card, s_py, psi_fix, h, w, native=True), y_q)


def test_escape_path_roundtrip(rig):
    """Out-of-alphabet latents travel the raw-escape path identically."""
    _, _, card, _ = rig
    rng = np.random.RandomState(2)
    h, w = 4, 6
    y_q = rng.randint(-5, 6, (h, w, card.M)).astype(np.float32)
    y_q[1, 2, 0] = 2000.0
    y_q[3, 5, card.M - 1] = -70000.0
    z_q = rng.randint(-3, 4, (1, 2, card.M)).astype(np.float32)
    psi_fix = card.hyper_forward(z_q)[:h, :w]
    s_py = portable_hp_encode(card, y_q, psi_fix, native=False)
    s_cc = portable_hp_encode(card, y_q, psi_fix, native=True)
    assert s_py == s_cc
    np.testing.assert_array_equal(
        portable_hp_decode(card, s_py, psi_fix, h, w, native=True), y_q)
    np.testing.assert_array_equal(
        portable_hp_decode(card, s_cc, psi_fix, h, w, native=False), y_q)


def test_family_is_enforced(rig):
    """Wavefront/checkerboard entry points reject hyperprior cards and vice
    versa — silent cross-use would desync."""
    _, _, card, _ = rig
    rng = np.random.RandomState(3)
    y_q = rng.randint(-3, 4, (4, 4, card.M)).astype(np.float32)
    psi_fix = card.hyper_forward(
        rng.randint(-2, 3, (1, 1, card.M)).astype(np.float32))
    with pytest.raises(ValueError, match="family"):
        portable_ar_encode(card, y_q, psi_fix)
    with pytest.raises(ValueError, match="family"):
        portable_cb_encode(card, y_q, psi_fix)


def test_codec_portable_end_to_end(rig):
    """compress_portable -> decode_latents equals the model's own eval
    quantization; decompress works; wrong card fails fast on the hash."""
    model, variables, card, K = rig
    codec = MeanScaleHyperpriorCodec(model, variables, portable_card=card)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 128, 3))
    data = codec.compress_portable(np.asarray(x))
    assert data[4] == 10  # _KIND_HYPERPRIOR_PORTABLE
    y_dec, z_dec = codec.decode_latents(data)
    out = model.apply(variables, x, training=False)
    np.testing.assert_array_equal(y_dec, np.asarray(out["y_in"])[0])
    np.testing.assert_array_equal(z_dec, np.asarray(out["z_in"])[0])
    x_hat = codec.decompress(data)
    assert x_hat.shape == (1, 64, 128, 3)

    # decompress_batch routes portable streams through the per-image path
    batch = codec.decompress_batch([data, data])
    np.testing.assert_array_equal(batch[0:1], x_hat)

    # a different card (fresh build from different weights) must fail fast
    model2, variables2 = _setup(K)
    wrong = PortableCard.build(model2, {"params": jax.tree.map(
        lambda a: a + 0.05, variables2["params"])}, zmin=-32, zmax=32,
        family="hyperprior")
    codec_wrong = MeanScaleHyperpriorCodec(model, variables,
                                           portable_card=wrong)
    with pytest.raises(ValueError, match="different card"):
        codec_wrong.decode_latents(data)


def test_card_save_load_family_and_hash(tmp_path, rig):
    _, _, card, _ = rig
    path = str(tmp_path / "hp_card.npz")
    card.save(path)
    loaded = PortableCard.load(path)
    assert loaded.family == 2
    assert loaded.hash == card.hash
    assert loaded.ctx.wq.size == 0 and loaded.ep1_phi.wq.size == 0


def test_corrupt_portable_stream_raises(rig):
    model, variables, card, _ = rig
    codec = MeanScaleHyperpriorCodec(model, variables, portable_card=card)
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(6), (1, 64, 64, 3)),
                   np.float32)
    data = codec.compress_portable(x)
    with pytest.raises(ValueError):
        codec.decode_latents(data[:-4])


def test_rate_overhead_vs_float_path(rig):
    """Card quantization costs low single-digit % vs the float hyperprior
    stream on a random-init model (converged models measure ~0 for the
    other families, see STATUS)."""
    model, variables, card, _ = rig
    codec = MeanScaleHyperpriorCodec(model, variables, portable_card=card)
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(7), (1, 128, 128, 3)),
                   np.float32)
    float_len = len(codec.compress(x))
    port_len = len(codec.compress_portable(x))
    assert port_len < float_len * 1.08 + 64
