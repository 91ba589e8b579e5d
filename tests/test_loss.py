"""RD-loss accounting tests against manual numpy computation."""

import math

import jax.numpy as jnp
import numpy as np

from neural_image_compression_tpu.train import rd_loss, vision_rd_loss


def _fake_out(B=2, H=32, W=32, M=4, hz=2, wz=2, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "x_hat": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        "logp_y": jnp.asarray(-rng.rand(B, H // 16, W // 16, M).astype(np.float32)),
        "logp_z": jnp.asarray(-rng.rand(B, hz, wz, M).astype(np.float32)),
    }


def test_rd_loss_manual():
    B, H, W = 2, 32, 32
    out = _fake_out(B, H, W)
    x = jnp.zeros((B, H, W, 3))
    res = rd_loss(out, x, lambda_rd=0.01)

    logp_y = np.asarray(out["logp_y"])
    logp_z = np.asarray(out["logp_z"])
    bits_y = -logp_y.sum(axis=(1, 2, 3)) / math.log(2)
    bits_z = -logp_z.sum(axis=(1, 2, 3)) / math.log(2)
    npx = H * W
    bpp_y = (bits_y / npx).mean()
    bpp_z = (bits_z / npx).mean()
    mse = np.mean(np.asarray(out["x_hat"]) ** 2)
    expected_loss = bpp_y + bpp_z + 0.01 * 255 ** 2 * mse

    np.testing.assert_allclose(float(res["loss"]), expected_loss, rtol=1e-5)
    np.testing.assert_allclose(float(res["bpp_y"]), bpp_y, rtol=1e-5)
    np.testing.assert_allclose(float(res["bpp_z"]), bpp_z, rtol=1e-5)
    np.testing.assert_allclose(float(res["bits_total"]), (bits_y + bits_z).mean(), rtol=1e-5)
    assert res["mse_per_image"].shape == (B,)


def test_rd_loss_psnr():
    out = _fake_out()
    x = jnp.asarray(np.asarray(out["x_hat"]) + 0.1)
    res = rd_loss(out, x, 0.005)
    np.testing.assert_allclose(float(res["psnr"]), -10 * math.log10(0.01 + 1e-8), rtol=1e-4)


def test_vision_rd_loss_two_layer_accounting():
    B, H, W = 2, 32, 32
    rng = np.random.RandomState(1)
    out = {
        "x_hat": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        "logp_y1": jnp.asarray(-rng.rand(B, 2, 2, 4).astype(np.float32)),
        "logp_y2": jnp.asarray(-rng.rand(B, 2, 2, 2).astype(np.float32)),
        "logp_z": jnp.asarray(-rng.rand(B, 1, 1, 6).astype(np.float32)),
        "F_tilde": jnp.asarray(rng.rand(B, 4, 4, 8).astype(np.float32)),
    }
    x = jnp.zeros((B, H, W, 3))
    res = vision_rd_loss(out, x, lambda_rd=0.01, gamma=0.5)
    assert abs(float(res["bpp_total"]) -
               (float(res["bpp_y1"]) + float(res["bpp_y2"]) + float(res["bpp_z"]))) < 1e-6
    # Without frozen nets, vision_mse is 0 and loss uses raw-scale MSE
    # (RateDistortionLoss.py:98 — no 255^2 factor).
    mse = np.mean(np.asarray(out["x_hat"]) ** 2)
    expected = float(res["bpp_total"]) + 0.01 * mse
    np.testing.assert_allclose(float(res["loss"]), expected, rtol=1e-5)
    assert float(res["vision_mse"]) == 0.0


def test_vision_rd_loss_with_distillation():
    B = 2
    out = {
        "x_hat": jnp.ones((B, 32, 32, 3)) * 0.5,
        "logp_y1": jnp.zeros((B, 2, 2, 4)),
        "logp_y2": jnp.zeros((B, 2, 2, 2)),
        "logp_z": jnp.zeros((B, 1, 1, 6)),
        "F_tilde": jnp.ones((B, 4, 4, 8)),
    }
    x = jnp.ones((B, 32, 32, 3)) * 0.5

    frozen = lambda f: f * 2.0          # noqa: E731
    V = lambda xh: jnp.ones((B, 4, 4, 8))  # noqa: E731
    res = vision_rd_loss(out, x, lambda_rd=1.0, gamma=0.5,
                         frozen_activation=frozen, V=V)
    # vision mse = mean((2-1)^2) = 1; recon mse = 0; loss = 0 + 1*(0 + 0.5*1)
    np.testing.assert_allclose(float(res["vision_mse"]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(res["loss"]), 0.5, rtol=1e-6)
