"""MS-SSIM training objective (train.loss.msssim_rd_loss).

The reference trains MSE-only (RateDistortionLoss.py:34) and only evaluates
MS-SSIM (Evaluator.py:38-45); this is the beyond-reference perceptual
training mode. Tests: accounting vs manual numpy, consistency with the
evaluation-side ms_ssim, gradient flow, and a Trainer integration run.
"""

import functools
import json
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_image_compression_tpu.evaluation.msssim import ms_ssim
from neural_image_compression_tpu.models import FactorizedPrior
from neural_image_compression_tpu.train import Trainer, msssim_rd_loss

# Two-level weights keep the minimum image size at (11-1)*2+1 = 21 px so
# the tests can run on small CPU-sized images (5 levels need >= 161 px).
_W2 = (0.5, 0.5)


def _fake_out(B=2, H=64, W=64, M=4, hz=2, wz=2, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "x_hat": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        "logp_y": jnp.asarray(-rng.rand(B, H // 16, W // 16, M).astype(np.float32)),
        "logp_z": jnp.asarray(-rng.rand(B, hz, wz, M).astype(np.float32)),
    }


def test_msssim_rd_loss_accounting():
    B, H, W = 2, 64, 64
    out = _fake_out(B, H, W)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    lam = 4.0
    res = msssim_rd_loss(out, x, lambda_rd=lam, weights=_W2)

    # Rate terms identical to rd_loss's accounting.
    bits_y = -np.asarray(out["logp_y"]).sum(axis=(1, 2, 3)) / math.log(2)
    bits_z = -np.asarray(out["logp_z"]).sum(axis=(1, 2, 3)) / math.log(2)
    npx = H * W
    np.testing.assert_allclose(float(res["bpp_y"]), (bits_y / npx).mean(), rtol=1e-5)
    np.testing.assert_allclose(float(res["bpp_z"]), (bits_z / npx).mean(), rtol=1e-5)

    # Distortion term is exactly the evaluation-side MS-SSIM.
    ref = float(ms_ssim(out["x_hat"], x, data_range=1.0, weights=_W2))
    np.testing.assert_allclose(float(res["msssim"]), ref, rtol=1e-6)
    expected = (bits_y / npx).mean() + (bits_z / npx).mean() + lam * (1.0 - ref)
    np.testing.assert_allclose(float(res["loss"]), expected, rtol=1e-5)

    # Diagnostics present and correctly shaped; MSE/PSNR are gradient-stopped
    # but numerically the same values rd_loss would report.
    assert res["msssim_per_image"].shape == (B,)
    mse = np.mean((np.asarray(out["x_hat"]) - np.asarray(x)) ** 2)
    np.testing.assert_allclose(float(res["mse"]), mse, rtol=1e-5)


def test_msssim_identical_images_loss_is_rate_only():
    out = _fake_out()
    x = out["x_hat"]
    res = msssim_rd_loss(out, x, lambda_rd=10.0, weights=_W2)
    np.testing.assert_allclose(float(res["msssim"]), 1.0, atol=1e-6)
    # lambda * (1 - msssim) contributes at most lambda * f32-eps here.
    np.testing.assert_allclose(float(res["loss"]),
                               float(res["bpp_total"]), atol=1e-5)


def test_msssim_gradient_flows_to_x_hat():
    out = _fake_out()
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(*out["x_hat"].shape).astype(np.float32))

    def f(x_hat):
        o = dict(out, x_hat=x_hat)
        return msssim_rd_loss(o, x, lambda_rd=4.0, weights=_W2)["loss"]

    g = jax.grad(f)(out["x_hat"])
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0.0
    # MSE/PSNR diagnostics are stop_gradient'ed: the gradient must be purely
    # the MS-SSIM path, i.e. unchanged when lambda doubles <=> scales by 2.
    g2 = np.asarray(jax.grad(lambda xh: msssim_rd_loss(
        dict(out, x_hat=xh), x, lambda_rd=8.0, weights=_W2)["loss"])(out["x_hat"]))
    np.testing.assert_allclose(g2, 2.0 * g, rtol=1e-4, atol=1e-8)


def test_default_weights_need_161px():
    out = _fake_out()
    x = jnp.zeros_like(out["x_hat"])
    with pytest.raises(ValueError, match="161"):
        msssim_rd_loss(out, x, lambda_rd=4.0)  # 64 px < 161 at 5 levels


def test_trainer_msssim_objective(tmp_path):
    rng = np.random.RandomState(0)
    loader = list(rng.rand(4, 2, 64, 64, 3).astype(np.float32))
    loss_fn = functools.partial(msssim_rd_loss, weights=_W2)
    trainer = Trainer(FactorizedPrior(latent_channels=8), loader,
                      rd_loss=loss_fn, lambda_val=8.0, max_steps=25,
                      learning_rate=1e-3, log_dir=str(tmp_path / "runs"),
                      checkpoint_path=None)
    trainer.train()
    rows = [json.loads(l) for l in open(tmp_path / "runs" / "metrics.jsonl")]
    losses = [r["value"] for r in rows if r["tag"] == "losses/loss"]
    msssims = [r["value"] for r in rows if r["tag"] == "losses/msssim"]
    assert len(losses) == 25
    assert losses[-1] < losses[0]
    assert msssims, "msssim diagnostic should be logged"
    assert all(np.isfinite(v) for v in msssims)


def test_config_and_cli_loss_selection(tmp_path):
    from neural_image_compression_tpu.config import Config

    cfg = Config()
    assert cfg.train.loss == "mse"
    cfg.train.loss = "msssim"
    rt = Config.from_json(cfg.to_json())
    assert rt.train.loss == "msssim"

    # CLI rejects unknown loss names and the scalable+msssim combination
    # before touching data or building the model.
    from neural_image_compression_tpu.cli import main as cli_main

    cfg_path = tmp_path / "cfg.json"
    bad = Config()
    bad.train.loss = "l1"
    cfg_path.write_text(bad.to_json())
    with pytest.raises(SystemExit, match="unknown train loss"):
        cli_main(["train", "--config", str(cfg_path),
                  "--train_dir", str(tmp_path)])

    sc = Config()
    sc.model.name = "scalable"
    sc.train.loss = "msssim"
    cfg_path.write_text(sc.to_json())
    with pytest.raises(SystemExit, match="not supported for the scalable"):
        cli_main(["train", "--config", str(cfg_path),
                  "--train_dir", str(tmp_path)])
