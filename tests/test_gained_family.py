"""Variable-rate (gained) hyperprior + checkerboard families: forward
contract, exact fold into the fixed-rate counterpart, level-sampled
training, and a real-bitstream round-trip per family on folded params —
the properties that make one set of transform weights serve the whole RD
curve through the existing codecs unchanged."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from neural_image_compression_tpu.models import (
    ChannelCheckerboardHierarchical, CheckerboardHierarchical,
    GainedChannelCheckerboard, GainedCheckerboard, GainedHyperprior,
    MeanScaleHyperprior, fold_gains, folded_model,
)
from neural_image_compression_tpu.train.loss import rd_loss

KEY = jax.random.PRNGKey(0)
LEVELS = (0.001, 0.005, 0.02)


def _init(model, shape=(1, 64, 64, 3)):
    x = jnp.zeros(shape, jnp.float32)
    return model.init({"params": KEY, "noise": KEY}, x,
                      training=False)["params"]


def _randomize_gains(params, seed=1):
    """All-ones init gains fold trivially; perturb to positive non-trivial
    values, growing the coding-domain gains per level so higher levels
    actually code bits at random init (same rig as tests/test_gained.py)."""
    rng = np.random.RandomState(seed)
    out = dict(params)
    for k in ("gain_y", "igain_y", "gain_z", "igain_z"):
        g = np.asarray(params[k])
        r = 0.3 + rng.rand(*g.shape).astype(np.float32) * 2.0
        if k in ("gain_y", "gain_z"):
            r = r * (4.0 ** np.arange(g.shape[0], dtype=np.float32))[:, None]
        out[k] = jnp.asarray(r)
    return out


@pytest.fixture(scope="module",
                params=["hyperprior", "checkerboard", "channel_cb"])
def rig(request):
    cls = {"hyperprior": GainedHyperprior,
           "checkerboard": GainedCheckerboard,
           "channel_cb": GainedChannelCheckerboard}[request.param]
    model = cls(latent_channels=8, K=2, levels=LEVELS)
    return request.param, model, _randomize_gains(_init(model))


def test_forward_contract_all_levels(rig):
    _, model, params = rig
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    for level in (0, 2, 0.5):
        out = model.apply({"params": params}, x, training=False, level=level)
        for k in ("x_hat", "y", "y_in", "z", "z_in", "p_y", "logp_y",
                  "p_z", "logp_z", "weights", "mus", "sigmas"):
            assert k in out, k
        assert out["x_hat"].shape == x.shape
        assert np.isfinite(np.asarray(out["x_hat"])).all()


def test_levels_change_the_rate(rig):
    _, model, params = rig
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    bits = []
    for level in (0, 2):
        out = model.apply({"params": params}, x, training=False, level=level)
        bits.append(float(rd_loss(out, x, 0.005)["bpp_total"]))
    assert bits[0] != bits[1]


def test_folded_model_type(rig):
    name, model, _ = rig
    fm = folded_model(model)
    want = {"hyperprior": MeanScaleHyperprior,
            "checkerboard": CheckerboardHierarchical,
            "channel_cb": ChannelCheckerboardHierarchical}[name]
    assert isinstance(fm, want)
    assert fm.latent_channels == model.latent_channels and fm.K == model.K


@pytest.mark.parametrize("level", [0, 1, 1.3])
def test_fold_matches_gained_forward(rig, level):
    """Folding at any level (incl. fractional) reproduces the gained forward
    up to f32 association; rounded-latent mismatches must be .5-tie flips
    (same contract as the joint family — tests/test_gained.py)."""
    _, model, params = rig
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    want = model.apply({"params": params}, x, training=False, level=level)
    fm = folded_model(model)
    fp = fold_gains(params, level)
    got = fm.apply({"params": fp}, x, training=False)

    def assert_latents_match(rounded, pre):
        a, b = np.asarray(got[rounded]), np.asarray(want[rounded])
        np.testing.assert_allclose(np.asarray(got[pre], np.float32),
                                   np.asarray(want[pre], np.float32),
                                   rtol=1e-5, atol=1e-5)
        if np.array_equal(a, b):
            return
        mism = a != b
        assert np.all(np.abs(a[mism] - b[mism]) <= 1.0), rounded
        pre_v = np.asarray(want[pre], np.float32)[mism]
        dist_to_tie = np.abs(pre_v - np.floor(pre_v) - 0.5)
        assert np.all(dist_to_tie < 1e-4), f"{rounded}: non-tie mismatch"

    assert_latents_match("y_in", "y")
    assert_latents_match("z_in", "z")
    np.testing.assert_allclose(np.asarray(got["x_hat"]),
                               np.asarray(want["x_hat"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got["p_y"]),
                               np.asarray(want["p_y"]), rtol=1e-5, atol=2e-7)
    np.testing.assert_allclose(np.asarray(got["p_z"]),
                               np.asarray(want["p_z"]), rtol=1e-5, atol=2e-7)


def test_codec_roundtrip_on_folded_model(rig):
    """A folded gained model drives its family's real bitstream codec
    unchanged: decoded latents bit-equal the gained eval forward's."""
    from neural_image_compression_tpu.coding import (
        ChannelCheckerboardCodec, CheckerboardCodec, MeanScaleHyperpriorCodec,
    )

    name, model, params = rig
    level = 1
    fm = folded_model(model)
    fp = fold_gains(params, level)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3))

    codec_cls = {"hyperprior": MeanScaleHyperpriorCodec,
                 "checkerboard": CheckerboardCodec,
                 "channel_cb": ChannelCheckerboardCodec}[name]
    codec = codec_cls(fm, {"params": fp})
    data = codec.compress(np.asarray(x))
    out = model.apply({"params": params}, x, training=False, level=level)
    x_hat = codec.decompress(data)
    np.testing.assert_allclose(
        x_hat, np.clip(np.asarray(out["x_hat"]), 0, 1), atol=2e-5)


def test_level_for_bpp_generalizes(rig):
    from neural_image_compression_tpu.models import level_for_bpp

    _, model, params = rig
    x = jax.random.uniform(jax.random.PRNGKey(6), (1, 64, 64, 3))

    def bpp_at(level):
        out = model.apply({"params": params}, x, training=False, level=level)
        return float(rd_loss(out, x, 0.005)["bpp_total"])

    b_lo, b_hi = bpp_at(0.0), bpp_at(2.0)
    assert b_lo < b_hi
    target = bpp_at(1.4)
    lvl, got = level_for_bpp(model, params, x, target, tol=0.005)
    assert abs(got - target) <= 0.01 * target


def test_train_step_samples_levels(rig):
    from neural_image_compression_tpu.parallel.train_step import (
        make_train_step,
    )

    _, model, params0 = rig
    tx = optax.adam(1e-3)
    opt_state = tx.init(params0)
    step = make_train_step(model, tx, rd_loss, 0.005, levels=model.levels)
    x = jax.random.uniform(jax.random.PRNGKey(7), (2, 64, 64, 3))
    params = params0
    g0 = np.asarray(params0["gain_y"])
    for i in range(6):
        params, opt_state, m = step(params, opt_state, x,
                                    jax.random.PRNGKey(i))
        assert np.isfinite(float(m["loss"]))
    assert not np.allclose(np.asarray(params["gain_y"]), g0)


def test_config_builds_the_new_families():
    from neural_image_compression_tpu.config import ModelConfig, build_model

    m = build_model(ModelConfig(name="gained_hyperprior", latent_channels=8,
                                K=2, levels=[0.001, 0.01]))
    assert isinstance(m, GainedHyperprior) and m.levels == (0.001, 0.01)
    m = build_model(ModelConfig(name="gained_checkerboard", latent_channels=8,
                                K=1))
    assert isinstance(m, GainedCheckerboard)
    m = build_model(ModelConfig(name="gained_channel_cb", latent_channels=8,
                                K=1))
    assert isinstance(m, GainedChannelCheckerboard)
