"""The _PARAM_FETCH entropy-parameter transfer dtype (round 5).

The one/two/2·G-pass float codecs fetch their GMM parameter rows (and the
wavefront/scalable families their psi grids) in f16 by default to halve
host<->device traffic; NIC_CODEC_PARAM_FETCH=f32 restores the old
behavior. Streams are self-consistent per config: encode and decode run
the same jitted program and upcast f16->f32 exactly, so round-trips are
bit-exact within a config, and the rate cost of f16 quantization is
negligible (σ's f16 relative step is 2^-11).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neural_image_compression_tpu.coding.codec as codec_mod
from neural_image_compression_tpu.coding.codec import (
    CheckerboardCodec, JointARCodec, MeanScaleHyperpriorCodec,
)
from neural_image_compression_tpu.models import (
    CheckerboardHierarchical, JointAutoregressiveHierarchical,
    MeanScaleHyperprior,
)

CASES = [
    ("hyperprior", MeanScaleHyperprior, MeanScaleHyperpriorCodec),
    ("checkerboard", CheckerboardHierarchical, CheckerboardCodec),
    ("joint_ar", JointAutoregressiveHierarchical, JointARCodec),
]


@pytest.fixture(scope="module")
def image():
    return np.asarray(
        jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3)),
        np.float32)


def _trained(Model):
    key = jax.random.PRNGKey(0)
    model = Model(latent_channels=8, K=1)
    x = jax.random.uniform(key, (2, 64, 64, 3))
    params = model.init({"params": key, "noise": key}, x,
                        training=True)["params"]
    return model, {"params": params}


@pytest.mark.parametrize("name,Model,Codec", CASES)
def test_both_fetch_dtypes_roundtrip_and_rate_neutral(name, Model, Codec,
                                                      image):
    model, variables = _trained(Model)
    sizes = {}
    recons = {}
    for dt in (jnp.float16, jnp.float32):
        old = codec_mod._PARAM_FETCH
        codec_mod._PARAM_FETCH = dt
        try:
            codec = Codec(model, variables)  # fresh programs per dtype
            stream = codec.compress(image)
            rec = codec.decompress(stream)
        finally:
            codec_mod._PARAM_FETCH = old
        assert rec.shape == image.shape
        assert np.isfinite(rec).all()
        sizes[dt.__name__] = len(stream)
        recons[dt.__name__] = rec
    # f16 parameter rounding must be rate-neutral to ~% level even on a
    # random-init model (worst case: broad σ, tiny streams)
    delta = abs(sizes["float16"] - sizes["float32"]) / sizes["float32"]
    assert delta < 0.05, sizes
    # reconstructions decode the same latents -> identical synthesis
    np.testing.assert_allclose(recons["float16"], recons["float32"],
                               atol=1e-6)


def test_default_is_f16():
    # the round-5 default ships f16 unless the env opts out; this guards
    # against the constant silently flipping
    import os

    want = (jnp.float32 if os.environ.get("NIC_CODEC_PARAM_FETCH", "f16")
            == "f32" else jnp.float16)
    assert codec_mod._PARAM_FETCH is want
