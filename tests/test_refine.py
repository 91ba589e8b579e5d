"""Encode-time latent refinement (coding/refine.py) + the codecs'
compress_latents entry points.

Two contracts under test:
  1. Refinement strictly improves the TRUE eval RD objective (forward on
     rounded latents) starting from the encoder's amortized guess, for
     every supported family.
  2. compress_latents is stream-compatible: fed the ANALYSIS latents it
     reproduces compress(x) byte-for-byte (proving the coding stage is
     identical), and fed refined latents it round-trips exactly through the
     unchanged decoder.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_image_compression_tpu.coding.codec import (
    ChannelCheckerboardCodec, CheckerboardCodec, FactorizedPriorCodec,
    JointARCodec, MeanScaleHyperpriorCodec,
)
from neural_image_compression_tpu.coding.refine import make_refiner
from neural_image_compression_tpu.models import (
    ChannelCheckerboardHierarchical, CheckerboardHierarchical,
    FactorizedPrior, JointAutoregressiveHierarchical, MeanScaleHyperprior,
)

KEY = jax.random.PRNGKey(0)

FAMILIES = [
    ("joint_ar", JointAutoregressiveHierarchical,
     dict(latent_channels=16, K=1), JointARCodec),
    ("checkerboard", CheckerboardHierarchical,
     dict(latent_channels=16, K=3), CheckerboardCodec),
    ("hyperprior", MeanScaleHyperprior,
     dict(latent_channels=16, K=1), MeanScaleHyperpriorCodec),
    ("channel_cb", ChannelCheckerboardHierarchical,
     dict(latent_channels=16, K=1), ChannelCheckerboardCodec),
    ("factorized", FactorizedPrior, dict(latent_channels=8),
     FactorizedPriorCodec),
]


@pytest.fixture(scope="module", params=FAMILIES, ids=[f[0] for f in FAMILIES])
def rig(request):
    name, Model, kw, Codec = request.param
    model = Model(**kw)
    x = jax.random.uniform(KEY, (1, 64, 128, 3))
    variables = {"params": model.init({"params": KEY, "noise": KEY}, x,
                                      training=False)["params"]}
    return name, model, variables, Codec


def test_refinement_improves_rd(rig):
    name, model, variables, _ = rig
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    refine = make_refiner(model, variables, 0.01, steps=120, lr=2e-2)
    y_q, z_q, m = refine(x)
    assert float(m["post_loss"]) < float(m["pre_loss"])
    assert np.isfinite(float(m["post_bpp_total"]))
    np.testing.assert_array_equal(np.asarray(y_q), np.round(np.asarray(y_q)))
    if name != "factorized":
        np.testing.assert_array_equal(np.asarray(z_q),
                                      np.round(np.asarray(z_q)))


def test_compress_latents_matches_compress(rig):
    """Fed the analysis latents (recovered exactly via decode_latents),
    compress_latents must reproduce compress() byte-for-byte."""
    name, model, variables, Codec = rig
    codec = Codec(model, variables)
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(2), (1, 100, 140, 3)),
                   np.float32)
    data = codec.compress(x)
    if name == "factorized":
        # no decode_latents; go through the analysis program directly
        from neural_image_compression_tpu.coding.codec import _pad_input
        y_q = np.asarray(codec._analysis_q(
            codec.variables, jnp.asarray(_pad_input(x, 16)))[0])[0]
        data2 = codec.compress_latents(y_q, 100, 140)
    else:
        y_q, z_q = codec.decode_latents(data)
        data2 = codec.compress_latents(y_q, z_q, 100, 140)
    assert data == data2


def test_refined_latents_roundtrip(rig):
    """Refined latents encode + decode exactly through the unchanged
    decoder; the reconstruction pipeline runs."""
    name, model, variables, Codec = rig
    codec = Codec(model, variables)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 128, 3))
    refine = make_refiner(model, variables, 0.01, steps=10, lr=1e-2)
    y_q, z_q, _ = refine(x)
    if name == "factorized":
        data = codec.compress_latents(np.asarray(y_q)[0], 64, 128)
        x_hat = codec.decompress(data)
    else:
        data = codec.compress_latents(np.asarray(y_q)[0], np.asarray(z_q)[0],
                                      64, 128)
        y_dec, z_dec = codec.decode_latents(data)
        np.testing.assert_array_equal(y_dec, np.asarray(y_q)[0])
        np.testing.assert_array_equal(z_dec, np.asarray(z_q)[0])
        x_hat = codec.decompress(data)
    assert x_hat.shape == (1, 64, 128, 3)


def test_compress_latents_validates(rig):
    name, model, variables, Codec = rig
    codec = Codec(model, variables)
    h, w = 64 // 16, 128 // 16
    M = model.latent_channels
    good_y = np.zeros((h, w, M), np.float32)
    good_z = np.zeros((h // 4, w // 4, M), np.float32)
    args = ((64, 128) if name == "factorized"
            else (good_z, 64, 128))
    with pytest.raises(ValueError, match="shape"):
        codec.compress_latents(np.zeros((h + 1, w, M), np.float32), *args)
    bad = good_y.copy()
    bad[0, 0, 0] = 0.5
    with pytest.raises(ValueError, match="integ|integral|non-integer"):
        codec.compress_latents(bad, *args)


@pytest.fixture(scope="module")
def scalable_rig():
    from neural_image_compression_tpu.coding.codec import ScalableCodec
    from neural_image_compression_tpu.models import ScalableImageCoding

    model = ScalableImageCoding(latent_channels=8, base_channels=4, K=1)
    x = jax.random.uniform(KEY, (1, 64, 128, 3))
    variables = {"params": model.init({"params": KEY, "noise": KEY}, x,
                                      training=False)["params"]}
    return model, variables, ScalableCodec(model, variables)


def test_scalable_refinement_improves_rd(scalable_rig):
    """The two-layer family refines under its own vision_rd_loss objective
    (per-layer likelihoods, no distillation term). vision_rd_loss keeps the
    reference's raw-MSE lambda semantic (no 255^2 factor —
    RateDistortionLoss.py:98), so the single-layer families' lambda=0.01
    corresponds to ~650 here."""
    model, variables, _ = scalable_rig
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    refine = make_refiner(model, variables, 650.0, steps=120, lr=2e-2)
    y_q, z_q, m = refine(x)
    assert float(m["post_loss"]) < float(m["pre_loss"])
    assert np.isfinite(float(m["post_bpp_total"]))
    np.testing.assert_array_equal(np.asarray(y_q), np.round(np.asarray(y_q)))
    np.testing.assert_array_equal(np.asarray(z_q), np.round(np.asarray(z_q)))


def test_scalable_compress_latents_matches_compress(scalable_rig):
    model, variables, codec = scalable_rig
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 128, 3)),
                   np.float32)
    from neural_image_compression_tpu.coding.codec import _pad_input
    y_q = np.asarray(codec._analysis_q(
        codec.variables, jnp.asarray(_pad_input(x, 64)))[0])[0]
    z_q = np.asarray(codec._analysis_q(
        codec.variables, jnp.asarray(_pad_input(x, 64)))[1])[0]
    assert codec.compress_latents(y_q, z_q, 64, 128) == codec.compress(x)
    assert (codec.compress_latents_portable(y_q, z_q, 64, 128)
            == codec.compress_portable(x))


def test_scalable_refined_latents_roundtrip(scalable_rig):
    """Refined latents ride both the float and portable layered streams;
    the decoded image equals the direct synthesis of the refined grid
    (pinning exact latent recovery), and truncate_base still applies."""
    model, variables, codec = scalable_rig
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 128, 3))
    refine = make_refiner(model, variables, 0.01, steps=10, lr=1e-2)
    y_q, z_q, _ = refine(x)
    y_np, z_np = np.asarray(y_q)[0], np.asarray(z_q)[0]
    (xh_direct,) = codec._synthesis(codec.variables, jnp.asarray(y_q))
    want = np.clip(np.asarray(xh_direct), 0.0, 1.0)
    m1 = model.base_channels
    for data in (codec.compress_latents(y_np, z_np, 64, 128),
                 codec.compress_latents_portable(y_np, z_np, 64, 128)):
        np.testing.assert_array_equal(codec.decompress(data), want)
        y1, f_tilde = codec.decompress_base(codec.truncate_base(data))
        np.testing.assert_array_equal(y1, y_np[..., :m1])
        assert np.isfinite(np.asarray(f_tilde)).all()
