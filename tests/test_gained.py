"""Variable-rate (gained) model: forward contract, exact gain folding into
the fixed-rate JointAR (the property that makes the codec/serving/evaluator
work unchanged), level-sampled training, and a real-bitstream round-trip on
a folded model."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from neural_image_compression_tpu.models import (
    GainedJointAR, JointAutoregressiveHierarchical, fold_gains, folded_model,
    interp_gain,
)
from neural_image_compression_tpu.train.loss import rd_loss

KEY = jax.random.PRNGKey(0)
LEVELS = (0.001, 0.005, 0.02)


def _init(model, shape=(1, 64, 64, 3)):
    x = jnp.zeros(shape, jnp.float32)
    return model.init({"params": KEY, "noise": KEY}, x, training=False)["params"]


def _randomize_gains(params, seed=1):
    """Init gains are all-ones (fold would be trivially exact); perturb them
    to positive non-trivial values so the tests exercise real scaling. The
    coding-domain gains (gain_y/gain_z) additionally grow 4x per level so
    higher levels quantize finely enough to actually code bits at random
    init (a trained model gets this from the rate loss)."""
    rng = np.random.RandomState(seed)
    out = dict(params)
    for k in ("gain_y", "igain_y", "gain_z", "igain_z"):
        g = np.asarray(params[k])
        r = 0.3 + rng.rand(*g.shape).astype(np.float32) * 2.0
        if k in ("gain_y", "gain_z"):
            r = r * (4.0 ** np.arange(g.shape[0], dtype=np.float32))[:, None]
        out[k] = jnp.asarray(r)
    return out


@pytest.fixture(scope="module")
def gained_small():
    model = GainedJointAR(latent_channels=8, K=2, levels=LEVELS)
    return model, _randomize_gains(_init(model))


def test_forward_contract_all_levels(gained_small):
    model, params = gained_small
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    for level in (0, 1, 2, 0.5):
        out = model.apply({"params": params}, x, training=False, level=level)
        for k in ("x_hat", "y", "y_in", "z", "z_in", "p_y", "logp_y",
                  "p_z", "logp_z", "weights", "mus", "sigmas"):
            assert k in out, k
        assert out["x_hat"].shape == x.shape
        assert np.isfinite(np.asarray(out["x_hat"])).all()


def test_levels_change_the_rate(gained_small):
    """Different gain rows quantize differently -> different bits."""
    model, params = gained_small
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    bits = []
    for level in (0, 2):
        out = model.apply({"params": params}, x, training=False, level=level)
        bits.append(float(rd_loss(out, x, 0.005)["bpp_total"]))
    assert bits[0] != bits[1]


def test_level_for_bpp_rate_control(gained_small):
    """Bisection finds the level matching a reachable target bpp; targets
    beyond the ladder clamp to the edge and report the edge's bpp."""
    from neural_image_compression_tpu.models import level_for_bpp

    model, params = gained_small
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3))

    def bpp_at(level):
        out = model.apply({"params": params}, x, training=False, level=level)
        return float(rd_loss(out, x, 0.005)["bpp_total"])

    b_lo, b_hi = bpp_at(0.0), bpp_at(2.0)
    assert b_lo < b_hi  # _randomize_gains makes the ladder monotone

    # reachable target: the bpp at an off-grid level must be recovered
    target = bpp_at(1.37)
    lvl, got = level_for_bpp(model, params, x, target, tol=0.005)
    assert 0.0 < lvl < 2.0
    assert abs(got - target) <= 0.01 * target
    assert abs(bpp_at(lvl) - target) <= 0.01 * target

    # unreachable targets clamp to the nearest edge
    lvl, got = level_for_bpp(model, params, x, b_lo * 0.5)
    assert lvl == 0.0 and abs(got - b_lo) < 1e-6
    lvl, got = level_for_bpp(model, params, x, b_hi * 2.0)
    assert lvl == 2.0 and abs(got - b_hi) < 1e-6

    with pytest.raises(ValueError, match="positive"):
        level_for_bpp(model, params, x, 0.0)
    with pytest.raises(ValueError, match="B, H, W"):
        level_for_bpp(model, params, x[0], 0.5)


@pytest.mark.parametrize("level", [0, 1, 2, 1.3])
def test_fold_matches_gained_forward(gained_small, level):
    """THE core property: folding the gains at any level (incl. fractional)
    into the boundary convs reproduces the gained forward up to f32
    association (sum(w_i*g*x_i) != g*sum(w_i*x_i) bit-for-bit, so a latent
    sitting exactly on a round() tie could flip by 1 between the two
    forwards — compare the pre-round latents tightly and allow round flips
    only where the pre-round value sat within tolerance of a .5 tie).
    Codec correctness is unaffected: encode and decode both use the FOLDED
    params, so they always agree with each other."""
    model, params = gained_small
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    want = model.apply({"params": params}, x, training=False, level=level)

    fm = folded_model(model)
    fp = fold_gains(params, level)
    got = fm.apply({"params": fp}, x, training=False)

    def assert_latents_match(rounded, pre):
        a, b = np.asarray(got[rounded]), np.asarray(want[rounded])
        # the pre-round latents must agree tightly...
        np.testing.assert_allclose(np.asarray(got[pre], np.float32),
                                   np.asarray(want[pre], np.float32),
                                   rtol=1e-5, atol=1e-5)
        if np.array_equal(a, b):
            return
        # ...and any rounded mismatch must be a tie flip: off by exactly one
        # step, with the pre-round value within f32 noise of an x.5 boundary
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


def test_interp_gain_endpoints_and_midpoint():
    table = jnp.asarray([[1.0, 4.0], [2.0, 1.0]])
    np.testing.assert_allclose(np.asarray(interp_gain(table, 0)), [1.0, 4.0],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(interp_gain(table, 1)), [2.0, 1.0],
                               rtol=1e-6)
    # geometric midpoint
    np.testing.assert_allclose(np.asarray(interp_gain(table, 0.5)),
                               [np.sqrt(2.0), 2.0], rtol=1e-6)
    # clipped outside the ladder
    np.testing.assert_allclose(np.asarray(interp_gain(table, 7.0)), [2.0, 1.0],
                               rtol=1e-6)


def test_train_step_samples_levels_and_moves_gains():
    model = GainedJointAR(latent_channels=8, K=1, levels=LEVELS)
    params = _init(model)
    from neural_image_compression_tpu.parallel.train_step import make_train_step

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, rd_loss, 0.005, levels=model.levels)
    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3))
    g0 = np.asarray(params["gain_y"])
    losses = []
    for i in range(8):
        params, opt_state, m = step(params, opt_state, x, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    # gains receive gradients (every level gets sampled across 8 steps whp;
    # at minimum SOME row must have moved)
    assert not np.allclose(np.asarray(params["gain_y"]), g0)


def test_trainer_runs_gained(tmp_path):
    from neural_image_compression_tpu.train import Trainer

    rng = np.random.RandomState(0)
    loader = list(rng.rand(3, 2, 64, 64, 3).astype(np.float32))
    model = GainedJointAR(latent_channels=8, K=1, levels=LEVELS)
    trainer = Trainer(model, loader, val_loader=loader[:1], max_steps=3,
                      val_interval=2, log_dir=str(tmp_path / "runs"),
                      checkpoint_path=None)
    trainer.train()
    assert trainer.step == 3


def test_codec_roundtrip_on_folded_model(gained_small):
    """A folded gained model drives the real bitstream codec unchanged."""
    from neural_image_compression_tpu.coding.codec import JointARCodec

    model, params = gained_small
    level = 1
    fm = folded_model(model)
    fp = fold_gains(params, level)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3))

    codec = JointARCodec(fm, {"params": fp})
    data = codec.compress(np.asarray(x))
    y_dec, z_dec = codec.decode_latents(data)

    out = model.apply({"params": params}, x, training=False, level=level)
    np.testing.assert_array_equal(z_dec, np.asarray(out["z_in"])[0])
    np.testing.assert_array_equal(y_dec, np.asarray(out["y_in"])[0])
    x_hat = codec.decompress(data)
    np.testing.assert_allclose(
        x_hat, np.clip(np.asarray(out["x_hat"]), 0, 1), atol=2e-5)


def test_validation_uses_fixed_mid_level(tmp_path):
    from neural_image_compression_tpu.train import Trainer

    loader = list(np.random.RandomState(0).rand(2, 1, 64, 64, 3)
                  .astype(np.float32))
    model = GainedJointAR(latent_channels=8, K=1, levels=LEVELS)
    trainer = Trainer(model, loader, max_steps=1,
                      log_dir=str(tmp_path / "runs"), checkpoint_path=None)
    assert trainer._val_kwargs == {"level": 1}
    assert trainer._val_lambda == LEVELS[1]


def test_bad_ladders_raise():
    x = jnp.zeros((1, 64, 64, 3))
    with pytest.raises(ValueError, match="ascending"):
        GainedJointAR(latent_channels=8, levels=(0.01, 0.001)).init(
            {"params": KEY, "noise": KEY}, x, training=False)
    with pytest.raises(ValueError, match=">= 2"):
        GainedJointAR(latent_channels=8, levels=(0.01,)).init(
            {"params": KEY, "noise": KEY}, x, training=False)


def test_fold_rejects_plain_params():
    model = JointAutoregressiveHierarchical(latent_channels=8, K=1)
    params = model.init({"params": KEY, "noise": KEY},
                        jnp.zeros((1, 64, 64, 3)), training=False)["params"]
    with pytest.raises(ValueError, match="not a gained param tree"):
        fold_gains(params, 0)


def test_gained_rd_curve(tmp_path, gained_small):
    """One gained model -> a full RD curve in lambda_sweep's format, directly
    consumable by evaluation.bd_rate / train.plot_rd_curve."""
    import json
    import os

    from neural_image_compression_tpu.train.sweep import (
        gained_rd_curve, interp_lambda,
    )

    model, params = gained_small
    loader = [np.asarray(jax.random.uniform(
        jax.random.PRNGKey(9), (1, 192, 192, 3)), np.float32)]
    pts = gained_rd_curve(model, params, loader, out_dir=str(tmp_path))
    assert len(pts) == len(LEVELS)
    assert [p["bpp"] for p in pts] == sorted(p["bpp"] for p in pts)
    for p in pts:
        assert {"lambda", "level", "bpp", "psnr", "msssim"} <= set(p)
    on_disk = json.load(open(os.path.join(str(tmp_path), "rd_curve.json")))
    assert on_disk == pts
    # fractional levels give interpolated lambdas
    assert interp_lambda(LEVELS, 0.5) == pytest.approx(
        (LEVELS[0] * LEVELS[1]) ** 0.5)
