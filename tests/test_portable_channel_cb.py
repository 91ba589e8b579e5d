"""Portable (cross-machine deterministic) streams for the CHANNEL_CB family
(coding/portable.py ChannelCBCards / portable_ccb_* + codec.py
ChannelCheckerboardCodec kind 12).

Mirrors tests/test_portable_checkerboard.py: the numpy and C++
implementations must produce bit-identical streams in both directions given
the same card SET, and the end-to-end codec path round-trips with the hash
fail-fast. The card set is pure composition — per group, a checkerboard-
family sub-card whose `hyper` slot carries the group's channel-context
convs — so no new native code exists to diverge; these tests pin the
composition (group chaining, [ch || psi] row layout, block framing).
"""

import numpy as np
import pytest

import jax

from neural_image_compression_tpu.coding.codec import ChannelCheckerboardCodec
from neural_image_compression_tpu.coding.portable import (
    ChannelCBCards, build_channel_cb_cards, portable_cb_encode,
    portable_ccb_decode, portable_ccb_encode,
)
from neural_image_compression_tpu.models import ChannelCheckerboardHierarchical

KEY = jax.random.PRNGKey(0)


def _setup(K, M=16):
    model = ChannelCheckerboardHierarchical(latent_channels=M, K=K)
    x = jax.random.uniform(KEY, (1, 64, 128, 3))
    variables = {"params": model.init({"params": KEY, "noise": KEY}, x,
                                      training=False)["params"]}
    return model, variables


@pytest.fixture(scope="module", params=[1, 3], ids=["K1", "K3"])
def rig(request):
    K = request.param
    model, variables = _setup(K)
    cards = build_channel_cb_cards(model, variables, zmin=-32, zmax=32)
    return model, variables, cards, K


def test_native_and_numpy_streams_bit_identical(rig):
    """The cross-implementation contract, both directions."""
    _, _, cards, _ = rig
    rng = np.random.RandomState(1)
    h, w = 6, 10
    y_q = rng.randint(-9, 10, (h, w, cards.M)).astype(np.float32)
    z_q = rng.randint(-4, 5, (2, 3, cards.M)).astype(np.float32)
    psi_py = cards.hyper_forward(z_q, native=False)[:h, :w]
    psi_cc = cards.hyper_forward(z_q, native=True)[:h, :w]
    np.testing.assert_array_equal(psi_py, psi_cc)

    s_py = portable_ccb_encode(cards, y_q, psi_py, native=False)
    s_cc = portable_ccb_encode(cards, y_q, psi_cc, native=True)
    assert s_py == s_cc
    np.testing.assert_array_equal(
        portable_ccb_decode(cards, s_cc, psi_py, h, w, native=False), y_q)
    np.testing.assert_array_equal(
        portable_ccb_decode(cards, s_py, psi_py, h, w, native=True), y_q)


def test_group_structure(rig):
    """Default uneven split sums to M; sub-cards are checkerboard-family
    with the group widths; group 0 carries the z hyper-decoder, later
    groups the 2-conv channel-context stacks."""
    model, _, cards, _ = rig
    assert cards.groups == (2, 2, 4, 8)
    assert cards.M == model.latent_channels
    for c, g in zip(cards.cards, cards.groups):
        assert c.family == 1 and c.M == g
    assert len(cards.cards[0].hyper) == 3      # deconv, deconv, conv
    for c in cards.cards[1:]:
        assert len(c.hyper) == 2               # conv5x5, conv5x5
        assert all(kind == "conv" and geom == (1, 2)
                   for kind, _, geom in c.hyper)


def test_escape_path_roundtrip(rig):
    """Out-of-alphabet latents travel the raw-escape path identically —
    including in a non-final group, whose escaped value feeds the next
    group's channel-context conv."""
    _, _, cards, _ = rig
    rng = np.random.RandomState(2)
    h, w = 4, 6
    y_q = rng.randint(-5, 6, (h, w, cards.M)).astype(np.float32)
    y_q[1, 2, 0] = 2000.0                      # group 0: feeds all ch ctx
    y_q[3, 5, cards.M - 1] = -70000.0          # last group
    z_q = rng.randint(-3, 4, (1, 2, cards.M)).astype(np.float32)
    psi_fix = cards.hyper_forward(z_q)[:h, :w]
    s_py = portable_ccb_encode(cards, y_q, psi_fix, native=False)
    s_cc = portable_ccb_encode(cards, y_q, psi_fix, native=True)
    assert s_py == s_cc
    np.testing.assert_array_equal(
        portable_ccb_decode(cards, s_py, psi_fix, h, w, native=True), y_q)
    np.testing.assert_array_equal(
        portable_ccb_decode(cards, s_cc, psi_fix, h, w, native=False), y_q)


def test_single_group_card_is_rejected(rig):
    """The ccb entry points take the card SET; a bare sub-card (a valid
    checkerboard card) must not silently pass for one."""
    _, _, cards, _ = rig
    sub = cards.cards[0]
    rng = np.random.RandomState(3)
    y_q = rng.randint(-3, 4, (4, 4, cards.M)).astype(np.float32)
    psi_fix = cards.hyper_forward(
        rng.randint(-2, 3, (1, 1, cards.M)).astype(np.float32))
    with pytest.raises(AttributeError):
        portable_ccb_encode(sub, y_q, psi_fix)
    # and the sub-card alone still encodes ITS group via the cb path
    s = portable_cb_encode(sub, y_q[..., :sub.M], psi_fix, native=False)
    assert isinstance(s, bytes) and len(s) > 0


def test_codec_portable_end_to_end(rig):
    """compress_portable -> decode_latents equals the model's own eval
    quantization; decompress works; wrong card set fails fast on the
    hash."""
    model, variables, cards, K = rig
    codec = ChannelCheckerboardCodec(model, variables, portable_card=cards)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 128, 3))
    data = codec.compress_portable(np.asarray(x))
    assert data[4] == 12  # _KIND_CHANNEL_CB_PORTABLE
    y_dec, z_dec = codec.decode_latents(data)
    out = model.apply(variables, x, training=False)
    np.testing.assert_array_equal(y_dec, np.asarray(out["y_in"])[0])
    np.testing.assert_array_equal(z_dec, np.asarray(out["z_in"])[0])
    x_hat = codec.decompress(data)
    assert x_hat.shape == (1, 64, 128, 3)

    # decompress_batch routes portable streams through the per-image path
    batch = codec.decompress_batch([data, data])
    np.testing.assert_array_equal(batch[0:1], x_hat)

    # a different card set (fresh build from perturbed weights) fails fast
    wrong = build_channel_cb_cards(
        model, {"params": jax.tree.map(lambda a: a + 0.05,
                                       variables["params"])},
        zmin=-32, zmax=32)
    codec_wrong = ChannelCheckerboardCodec(model, variables,
                                           portable_card=wrong)
    with pytest.raises(ValueError, match="different card"):
        codec_wrong.decode_latents(data)


def test_card_set_save_load_and_hash(tmp_path, rig):
    _, _, cards, _ = rig
    path = str(tmp_path / "ccb_cards.npz")
    cards.save(path)
    loaded = ChannelCBCards.load(path)
    assert loaded.groups == cards.groups
    assert loaded.hash == cards.hash
    assert all(a.hash == b.hash for a, b in zip(loaded.cards, cards.cards))


def test_group_mismatch_is_rejected(rig):
    """A card set for different groups must not pair with the codec."""
    model, variables, cards, K = rig
    other = ChannelCheckerboardHierarchical(
        latent_channels=cards.M, K=K, groups=(8, 8))
    codec = ChannelCheckerboardCodec(other, variables, portable_card=cards)
    with pytest.raises(ValueError, match="groups"):
        codec.portable_card()


def test_corrupt_portable_stream_raises(rig):
    model, variables, cards, _ = rig
    codec = ChannelCheckerboardCodec(model, variables, portable_card=cards)
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(6), (1, 64, 64, 3)),
                   np.float32)
    data = codec.compress_portable(x)
    with pytest.raises(ValueError):
        codec.decode_latents(data[:-4])
    # block table not covering the payload (the codec slices y by len_y, so
    # exercise the framing check at the portable layer directly)
    rng = np.random.RandomState(8)
    h, w = 4, 4
    y_q = rng.randint(-3, 4, (h, w, cards.M)).astype(np.float32)
    psi = cards.hyper_forward(
        rng.randint(-2, 3, (1, 1, cards.M)).astype(np.float32))[:h, :w]
    payload = portable_ccb_encode(cards, y_q, psi)
    with pytest.raises(ValueError, match="block table|truncated"):
        portable_ccb_decode(cards, payload + b"\x00", psi, h, w)
    with pytest.raises(ValueError, match="block table|truncated"):
        portable_ccb_decode(cards, payload[:3], psi, h, w)


def test_rate_overhead_vs_float_path(rig):
    """Card quantization costs low single-digit % vs the float channel_cb
    stream on a random-init model (converged models measure ~0, see
    STATUS)."""
    model, variables, cards, _ = rig
    codec = ChannelCheckerboardCodec(model, variables, portable_card=cards)
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(7), (1, 128, 128, 3)),
                   np.float32)
    float_len = len(codec.compress(x))
    port_len = len(codec.compress_portable(x))
    assert port_len < float_len * 1.08 + 64
