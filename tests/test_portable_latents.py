"""Portable-path compress_latents: externally-supplied integer latents
(e.g. refined by coding/refine.py) carried in cross-machine deterministic
streams.

Closes the one composition gap the portable pipeline had (encode-side
latent choice could not ride portable streams): every portable family
codec now exposes compress_latents_portable, stream-compatible with
compress_portable — entropy parameters derive from z_q + coded-y context
only, never from how y_q was produced. These tests pin:

  1. identity: feeding a stream's own decoded latents back reproduces the
     stream byte-for-byte;
  2. round-trip: perturbed (refined-like) latents decode back exactly;
  3. numpy <-> C++ bit-identity in both directions at the codec level
     (NIC_DISABLE_NATIVE_AR toggles the implementation per call);
  4. z outside the card's frozen table range is clipped consistently.
"""

import numpy as np
import pytest

import jax

from neural_image_compression_tpu.coding.codec import (
    ChannelCheckerboardCodec, CheckerboardCodec, FactorizedPriorCodec,
    JointARCodec, MeanScaleHyperpriorCodec,
)
from neural_image_compression_tpu.models import (
    ChannelCheckerboardHierarchical, CheckerboardHierarchical,
    FactorizedPrior, JointAutoregressiveHierarchical, MeanScaleHyperprior,
)

KEY = jax.random.PRNGKey(0)

FAMILIES = {
    "joint_ar": (lambda M: JointAutoregressiveHierarchical(
        latent_channels=M, K=1), JointARCodec, 8),
    "checkerboard": (lambda M: CheckerboardHierarchical(
        latent_channels=M, K=1), CheckerboardCodec, 8),
    "channel_cb": (lambda M: ChannelCheckerboardHierarchical(
        latent_channels=M, K=1), ChannelCheckerboardCodec, 16),
    "hyperprior": (lambda M: MeanScaleHyperprior(
        latent_channels=M, K=1), MeanScaleHyperpriorCodec, 8),
}


@pytest.fixture(scope="module", params=sorted(FAMILIES), ids=sorted(FAMILIES))
def rig(request):
    make_model, Codec, M = FAMILIES[request.param]
    model = make_model(M)
    x = np.asarray(jax.random.uniform(KEY, (1, 64, 128, 3)))
    variables = {"params": model.init({"params": KEY, "noise": KEY},
                                      jax.numpy.asarray(x),
                                      training=False)["params"]}
    codec = Codec(model, variables)
    data = codec.compress_portable(x)
    y_q, z_q = codec.decode_latents(data)
    return codec, x, data, y_q, z_q


def test_own_latents_reproduce_stream_byte_identical(rig):
    codec, x, data, y_q, z_q = rig
    h, w = x.shape[1], x.shape[2]
    assert codec.compress_latents_portable(y_q, z_q, h, w) == data


def test_perturbed_latents_roundtrip_exact(rig):
    """Refined-like latents (integer perturbation of the analysis output)
    decode back exactly — the stream carries the caller's grids, not the
    encoder's guess."""
    codec, x, _, y_q, z_q = rig
    h, w = x.shape[1], x.shape[2]
    rng = np.random.RandomState(3)
    y_r = y_q + rng.randint(-2, 3, y_q.shape).astype(np.float32)
    z_r = np.clip(z_q + rng.randint(-1, 2, z_q.shape).astype(np.float32),
                  codec.portable_card().zmin, codec.portable_card().zmax)
    data = codec.compress_latents_portable(y_r, z_r, h, w)
    y_d, z_d = codec.decode_latents(data)
    np.testing.assert_array_equal(y_d, y_r)
    np.testing.assert_array_equal(z_d, z_r)
    # and the image path still runs on the refined stream
    out = codec.decompress(data)
    assert out.shape == x.shape


def test_numpy_and_native_bit_identical_both_directions(rig, monkeypatch):
    codec, x, _, y_q, z_q = rig
    h, w = x.shape[1], x.shape[2]
    rng = np.random.RandomState(4)
    y_r = y_q + rng.randint(-1, 2, y_q.shape).astype(np.float32)

    monkeypatch.setenv("NIC_DISABLE_NATIVE_AR", "1")
    s_py = codec.compress_latents_portable(y_r, z_q, h, w)
    y_py, z_py = codec.decode_latents(s_py)
    monkeypatch.delenv("NIC_DISABLE_NATIVE_AR")
    s_cc = codec.compress_latents_portable(y_r, z_q, h, w)
    assert s_py == s_cc
    # native-encoded stream decoded by numpy and vice versa
    monkeypatch.setenv("NIC_DISABLE_NATIVE_AR", "1")
    y_x, z_x = codec.decode_latents(s_cc)
    np.testing.assert_array_equal(y_x, y_r)
    np.testing.assert_array_equal(y_py, y_r)
    np.testing.assert_array_equal(z_py, z_q)
    np.testing.assert_array_equal(z_x, z_q)


def test_out_of_range_z_is_clipped_consistently(rig):
    codec, x, _, y_q, z_q = rig
    h, w = x.shape[1], x.shape[2]
    card = codec.portable_card()
    z_far = z_q.copy()
    z_far.flat[0] = card.zmax + 7
    z_far.flat[-1] = card.zmin - 7
    data = codec.compress_latents_portable(y_q, z_far, h, w)
    _, z_d = codec.decode_latents(data)
    np.testing.assert_array_equal(
        z_d, np.clip(z_far, card.zmin, card.zmax))


def test_factorized_latents_portable():
    """Factorized family: no z; y is clipped to the card's frozen table
    range and round-trips through the portable stream."""
    model = FactorizedPrior(latent_channels=8)
    x = np.asarray(jax.random.uniform(KEY, (1, 48, 80, 3)))
    variables = {"params": model.init({"params": KEY, "noise": KEY},
                                      jax.numpy.asarray(x),
                                      training=False)["params"]}
    codec = FactorizedPriorCodec(model, variables)
    data = codec.compress_portable(x)
    h, w = x.shape[1], x.shape[2]
    # identity: rebuild the stream from its own latents
    from neural_image_compression_tpu.coding.codec import _pad_input
    y_q = np.asarray(
        codec._analysis_q(codec.variables,
                          jax.numpy.asarray(_pad_input(x, 16)))[0])[0]
    assert codec.compress_latents_portable(y_q, h, w) == data
    # perturbed grid round-trips through decompress (pixel path only —
    # factorized has no decode_latents; equality of the decoded image
    # against the synthesis of the perturbed grid pins the payload)
    rng = np.random.RandomState(5)
    y_r = np.clip(y_q + rng.randint(-1, 2, y_q.shape).astype(np.float32),
                  codec.portable_card().ymin, codec.portable_card().ymax)
    out = codec.decompress(codec.compress_latents_portable(y_r, h, w))
    ref = codec.decompress(codec.compress_latents(y_r, h, w))
    np.testing.assert_array_equal(out, ref)
