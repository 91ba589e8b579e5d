"""CLI + config round-trip tests (small end-to-end runs)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from neural_image_compression_tpu.config import Config, ModelConfig, build_model
from neural_image_compression_tpu.cli import main as cli_main


def test_config_json_roundtrip():
    cfg = Config()
    cfg.model.latent_channels = 64
    cfg.train.lambda_rd = 0.01
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2.model.latent_channels == 64
    assert cfg2.train.lambda_rd == 0.01
    assert cfg2.model.name == "joint_ar"


@pytest.mark.parametrize("name", ["joint_ar", "residual", "factorized", "scalable"])
def test_build_model(name):
    cfg = ModelConfig(name=name, latent_channels=16, K=2, base_channels=8)
    model = build_model(cfg)
    assert model is not None


def test_build_model_unknown():
    with pytest.raises(ValueError):
        build_model(ModelConfig(name="nope"))


def _write_images(d, n=3, size=300):
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        Image.fromarray((rng.rand(size, size, 3) * 255).astype(np.uint8)
                        ).save(os.path.join(d, f"im{i}.png"))


def test_cli_preprocess(tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _write_images(src)
    cli_main(["preprocess", "--input_dir", src, "--output_dir", dst,
              "--target_size", "128", "--seed", "0"])
    assert len(os.listdir(dst)) == 3


def test_cli_train_and_eval(tmp_path):
    train_dir = str(tmp_path / "train")
    _write_images(train_dir, n=2, size=192)
    cfg = Config()
    cfg.model.name = "factorized"
    cfg.model.latent_channels = 8
    cfg.data.train_dir = train_dir
    cfg.data.batch_size = 1
    cfg.train.max_steps = 2
    cfg.train.log_dir = str(tmp_path / "runs")
    cfg.train.checkpoint_path = str(tmp_path / "ckpt")
    cfg.eval.data_dir = train_dir
    cfg.eval.save_dir = str(tmp_path / "eval")
    cfg.eval.caption = "cli"
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())

    cli_main(["train", "--config", cfg_path])
    assert os.path.isdir(cfg.train.checkpoint_path)

    # eval fails on 192px (png loader reads 192x192 — fine for ms-ssim min 161)
    cli_main(["eval", "--config", cfg_path])
    outs = os.listdir(cfg.eval.save_dir)
    assert any(o.startswith("eval_results_") for o in outs)


def test_cli_compress_decompress(tmp_path):
    img_path = str(tmp_path / "in.png")
    rng = np.random.RandomState(1)
    Image.fromarray((rng.rand(100, 140, 3) * 255).astype(np.uint8)).save(img_path)

    cfg = Config()
    cfg.model.name = "factorized"
    cfg.model.latent_channels = 8
    cfg.train.checkpoint_path = str(tmp_path / "nockpt")
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())

    bit_path = str(tmp_path / "out.nic")
    rec_path = str(tmp_path / "rec.png")
    cli_main(["compress", "--config", cfg_path, "--image", img_path,
              "--out", bit_path])
    assert os.path.getsize(bit_path) > 0
    cli_main(["decompress", "--config", cfg_path, "--bitstream", bit_path,
              "--out", rec_path])
    rec = np.asarray(Image.open(rec_path))
    assert rec.shape == (100, 140, 3)  # cropped back from the 64-multiple pad


def test_cli_compress_decompress_multi(tmp_path):
    """Several same-size images route through the batched codec path and
    land in output directories."""
    rng = np.random.RandomState(4)
    img_paths = []
    for i in range(2):
        p = str(tmp_path / f"in{i}.png")
        Image.fromarray((rng.rand(70, 90, 3) * 255).astype(np.uint8)).save(p)
        img_paths.append(p)

    cfg = Config()
    cfg.model.name = "joint_ar"
    cfg.model.latent_channels = 8
    cfg.model.K = 3
    cfg.train.checkpoint_path = str(tmp_path / "nockpt")
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())

    bits_dir = str(tmp_path / "bits")
    rec_dir = str(tmp_path / "recs")
    cli_main(["compress", "--config", cfg_path, "--image", *img_paths,
              "--out", bits_dir])
    bit_paths = [os.path.join(bits_dir, f"in{i}.nic") for i in range(2)]
    assert all(os.path.getsize(p) > 0 for p in bit_paths)
    cli_main(["decompress", "--config", cfg_path, "--bitstream", *bit_paths,
              "--out", rec_dir])
    for i in range(2):
        rec = np.asarray(Image.open(os.path.join(rec_dir, f"in{i}.png")))
        assert rec.shape == (70, 90, 3)


def test_cli_compress_decompress_scalable(tmp_path):
    img_path = str(tmp_path / "in.png")
    rng = np.random.RandomState(2)
    Image.fromarray((rng.rand(80, 90, 3) * 255).astype(np.uint8)).save(img_path)

    cfg = Config()
    cfg.model.name = "scalable"
    cfg.model.latent_channels = 12
    cfg.model.base_channels = 8
    cfg.model.K = 1
    cfg.train.checkpoint_path = str(tmp_path / "nockpt")
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())

    bit_path = str(tmp_path / "out.nic")
    rec_path = str(tmp_path / "rec.png")
    cli_main(["compress", "--config", cfg_path, "--image", img_path,
              "--out", bit_path])
    cli_main(["decompress", "--config", cfg_path, "--bitstream", bit_path,
              "--out", rec_path])
    assert np.asarray(Image.open(rec_path)).shape == (80, 90, 3)


def test_cli_eval_with_codec(tmp_path):
    train_dir = str(tmp_path / "imgs")
    _write_images(train_dir, n=1, size=192)
    cfg = Config()
    cfg.model.name = "factorized"
    cfg.model.latent_channels = 8
    cfg.train.checkpoint_path = str(tmp_path / "nockpt")
    cfg.eval.data_dir = train_dir
    cfg.eval.save_dir = str(tmp_path / "eval")
    cfg.eval.caption = "codec"
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())
    cli_main(["eval", "--config", cfg_path, "--codec"])
    txt = open(os.path.join(cfg.eval.save_dir,
                            "eval_results_0.005_lambda_codec.txt")).read()
    assert "codec/BPP(bitstream)" in txt


def test_cli_compress_streams(tmp_path):
    """--streams N routes through the interleaved coder; decompress needs no
    extra flag (N is in the bitstream header)."""
    img_path = str(tmp_path / "in.png")
    rng = np.random.RandomState(7)
    Image.fromarray((rng.rand(70, 70, 3) * 255).astype(np.uint8)).save(img_path)

    cfg = Config()
    cfg.model.name = "joint_ar"
    cfg.model.latent_channels = 8
    cfg.model.K = 1
    cfg.train.checkpoint_path = str(tmp_path / "nockpt")
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())

    bit_path = str(tmp_path / "out.nic")
    rec_path = str(tmp_path / "rec.png")
    cli_main(["compress", "--config", cfg_path, "--image", img_path,
              "--out", bit_path, "--streams", "4"])
    cli_main(["decompress", "--config", cfg_path, "--bitstream", bit_path,
              "--out", rec_path])
    assert np.asarray(Image.open(rec_path)).shape == (70, 70, 3)


def test_cli_portable_card_roundtrip(tmp_path):
    """--card builds + saves the portable card on first compress, then
    decompress loads it; recon matches the non-portable path."""
    img_path = str(tmp_path / "in.png")
    rng = np.random.RandomState(2)
    Image.fromarray((rng.rand(80, 120, 3) * 255).astype(np.uint8)).save(img_path)

    cfg = Config()
    cfg.model.name = "joint_ar"
    cfg.model.latent_channels = 8
    cfg.model.K = 1
    cfg.train.checkpoint_path = str(tmp_path / "nockpt")
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())

    card_path = str(tmp_path / "model.card.npz")
    bit_path = str(tmp_path / "out.nic")
    rec_path = str(tmp_path / "rec.png")
    plain_path = str(tmp_path / "plain.nic")
    cli_main(["compress", "--config", cfg_path, "--image", img_path,
              "--out", bit_path, "--card", card_path])
    assert os.path.exists(card_path)
    cli_main(["decompress", "--config", cfg_path, "--bitstream", bit_path,
              "--out", rec_path, "--card", card_path])
    cli_main(["compress", "--config", cfg_path, "--image", img_path,
              "--out", plain_path, "--streams", "1"])
    rec2_path = str(tmp_path / "rec2.png")
    cli_main(["decompress", "--config", cfg_path, "--bitstream", plain_path,
              "--out", rec2_path])
    np.testing.assert_array_equal(np.asarray(Image.open(rec_path)),
                                  np.asarray(Image.open(rec2_path)))


@pytest.mark.parametrize("name", ["factorized", "scalable", "channel_cb"])
def test_cli_portable_card_roundtrip_other_families(tmp_path, name):
    """--card works for every codec family: factorized saves a
    FactorizedCard, scalable a namespaced l1_/l2_ card pair, channel_cb a
    per-group ChannelCBCards set; decompress loads the artifact and
    reconstructs identically to the default path."""
    img_path = str(tmp_path / "in.png")
    rng = np.random.RandomState(3)
    Image.fromarray((rng.rand(80, 96, 3) * 255).astype(np.uint8)).save(img_path)

    cfg = Config()
    cfg.model.name = name
    cfg.model.latent_channels = 8
    cfg.model.K = 1
    if name == "scalable":
        cfg.model.base_channels = 4
    cfg.train.checkpoint_path = str(tmp_path / "nockpt")
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())

    card_path = str(tmp_path / "model.card.npz")
    bit_path = str(tmp_path / "out.nic")
    rec_path = str(tmp_path / "rec.png")
    cli_main(["compress", "--config", cfg_path, "--image", img_path,
              "--out", bit_path, "--card", card_path])
    assert os.path.exists(card_path)
    cli_main(["decompress", "--config", cfg_path, "--bitstream", bit_path,
              "--out", rec_path, "--card", card_path])

    plain_path = str(tmp_path / "plain.nic")
    rec2_path = str(tmp_path / "rec2.png")
    cli_main(["compress", "--config", cfg_path, "--image", img_path,
              "--out", plain_path])
    cli_main(["decompress", "--config", cfg_path, "--bitstream", plain_path,
              "--out", rec2_path])
    np.testing.assert_array_equal(np.asarray(Image.open(rec_path)),
                                  np.asarray(Image.open(rec2_path)))


def test_cli_compress_refine(tmp_path):
    """--refine optimizes the latents before coding; the stream stays
    decodable by the unchanged decompress path."""
    img_path = str(tmp_path / "in.png")
    rng = np.random.RandomState(5)
    Image.fromarray((rng.rand(70, 90, 3) * 255).astype(np.uint8)).save(img_path)

    cfg = Config()
    cfg.model.name = "hyperprior"
    cfg.model.latent_channels = 8
    cfg.model.K = 1
    cfg.train.checkpoint_path = str(tmp_path / "nockpt")
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())

    bit_path = str(tmp_path / "out.nic")
    rec_path = str(tmp_path / "rec.png")
    cli_main(["compress", "--config", cfg_path, "--image", img_path,
              "--out", bit_path, "--refine", "8", "--refine_lr", "0.02"])
    cli_main(["decompress", "--config", cfg_path, "--bitstream", bit_path,
              "--out", rec_path])
    assert np.asarray(Image.open(rec_path)).shape == (70, 90, 3)


def test_cli_compress_refine_portable(tmp_path):
    """--refine composes with --card: the refined latents ride a portable
    cross-machine stream (compress_latents_portable) that the portable
    decompress path decodes."""
    img_path = str(tmp_path / "in.png")
    rng = np.random.RandomState(6)
    Image.fromarray((rng.rand(70, 90, 3) * 255).astype(np.uint8)).save(img_path)

    cfg = Config()
    cfg.model.name = "hyperprior"
    cfg.model.latent_channels = 8
    cfg.model.K = 1
    cfg.train.checkpoint_path = str(tmp_path / "nockpt")
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())

    card_path = str(tmp_path / "model.card.npz")
    bit_path = str(tmp_path / "out.nic")
    rec_path = str(tmp_path / "rec.png")
    cli_main(["compress", "--config", cfg_path, "--image", img_path,
              "--out", bit_path, "--card", card_path, "--refine", "6"])
    assert os.path.exists(card_path)
    with open(bit_path, "rb") as f:
        f.read(10)  # the stream exists and is non-trivial
    cli_main(["decompress", "--config", cfg_path, "--bitstream", bit_path,
              "--out", rec_path, "--card", card_path])
    assert np.asarray(Image.open(rec_path)).shape == (70, 90, 3)


def test_cli_train_scalable_with_backbone(tmp_path):
    """Scalable training through the CLI with the distillation term live:
    gamma > 0 plus a saved backbone activates FirstHalf(V) + the frozen
    cut-layer activation inside the jitted loss."""
    import jax

    from neural_image_compression_tpu.models import (
        build_yolo_backbone, save_backbone)

    train_dir = str(tmp_path / "train")
    _write_images(train_dir, n=2, size=192)
    bb = build_yolo_backbone(width=4)  # P3 channels 16 = 2*base_channels
    bvars = bb.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
    bb_path = str(tmp_path / "bb.npz")
    save_backbone(bb_path, 4, bvars)

    cfg = Config()
    cfg.model.name = "scalable"
    cfg.model.latent_channels = 16
    cfg.model.base_channels = 8
    cfg.model.K = 1
    cfg.data.train_dir = train_dir
    cfg.data.batch_size = 1
    cfg.train.max_steps = 2
    cfg.train.gamma = 1.0
    cfg.train.log_dir = str(tmp_path / "runs")
    cfg.train.checkpoint_path = str(tmp_path / "ckpt")
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())

    cli_main(["train", "--config", cfg_path, "--backbone", bb_path])
    assert os.path.isdir(cfg.train.checkpoint_path)
    # the vision term was live: metrics JSONL records a nonzero vision_mse
    import glob
    import json as _json
    logs = glob.glob(os.path.join(cfg.train.log_dir, "**", "*.jsonl"),
                     recursive=True)
    assert logs
    rows = [_json.loads(l) for l in open(logs[0])]
    assert any(r["tag"] == "losses/vision_mse" and r["value"] > 0
               for r in rows)

    # eval with the backbone reports the distillation MSE in the artifact —
    # even at gamma=0 (the gamma gate is train-only; eval reports vision_mse
    # whenever a backbone is given)
    cfg.train.gamma = 0.0
    cfg.eval.data_dir = train_dir
    cfg.eval.save_dir = str(tmp_path / "eval")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())
    cli_main(["eval", "--config", cfg_path, "--backbone", bb_path])
    txts = [o for o in os.listdir(cfg.eval.save_dir)
            if o.startswith("eval_results_")]
    assert txts
    body = open(os.path.join(cfg.eval.save_dir, txts[0])).read()
    assert "VisionMSE" in body


def test_cli_bdrate(tmp_path, capsys):
    anchor = [{"lambda": 0.001, "bpp": 0.1, "psnr": 28.0, "msssim": 0.90},
              {"lambda": 0.005, "bpp": 0.3, "psnr": 32.0, "msssim": 0.94},
              {"lambda": 0.02, "bpp": 0.7, "psnr": 36.0, "msssim": 0.97}]
    test = [dict(p, bpp=p["bpp"] * 0.9) for p in anchor]
    a_path, t_path = str(tmp_path / "a.json"), str(tmp_path / "t.json")
    with open(a_path, "w") as f:
        json.dump(anchor, f)
    with open(t_path, "w") as f:
        json.dump(test, f)

    cli_main(["bdrate", a_path, t_path])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["bd_rate_pct"] == pytest.approx(-10.0, rel=1e-6)
    assert out["bd_psnr"] > 0

    cli_main(["bdrate", a_path, t_path, "--metric", "msssim"])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["bd_rate_pct"] == pytest.approx(-10.0, rel=1e-6)
    assert "bd_msssim" in out


def test_cli_bdrate_no_overlap_exits(tmp_path):
    a = [{"bpp": 0.1, "psnr": 28.0}, {"bpp": 0.3, "psnr": 32.0}]
    b = [{"bpp": 0.1, "psnr": 48.0}, {"bpp": 0.3, "psnr": 52.0}]
    a_path, b_path = str(tmp_path / "a.json"), str(tmp_path / "b.json")
    with open(a_path, "w") as f:
        json.dump(a, f)
    with open(b_path, "w") as f:
        json.dump(b, f)
    with pytest.raises(SystemExit, match="overlap"):
        cli_main(["bdrate", a_path, b_path])


def test_cli_export(tmp_path, capsys):
    cfg = Config()
    cfg.model.name = "factorized"
    cfg.model.latent_channels = 8
    cfg.train.checkpoint_path = str(tmp_path / "no_ckpt")  # random init path
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())
    out_path = str(tmp_path / "model.shlo")

    cli_main(["export", "--config", cfg_path, "--out", out_path,
              "--height", "64", "--width", "64", "--batch", "1"])
    assert "exported factorized" in capsys.readouterr().out
    assert os.path.getsize(out_path) > 0

    from neural_image_compression_tpu import serving
    loaded = serving.load_exported(out_path)
    out = loaded.call(np.zeros((1, 64, 64, 3), np.float32))
    assert out["x_hat"].shape == (1, 64, 64, 3)


def test_cli_export_bad_size_exits(tmp_path):
    with pytest.raises(SystemExit, match="multiples of 64"):
        cli_main(["export", "--out", str(tmp_path / "x.shlo"),
                  "--height", "100", "--width", "64"])


def test_cli_train_ema_and_restore_prefers_ema(tmp_path, capsys):
    """A run with ema_decay>0 checkpoints ema_params, and the CLI restore
    path (eval/compress/export) deploys those instead of the raw params."""
    train_dir = str(tmp_path / "train")
    _write_images(train_dir, n=2, size=192)
    cfg = Config()
    cfg.model.name = "factorized"
    cfg.model.latent_channels = 8
    cfg.data.train_dir = train_dir
    cfg.data.batch_size = 1
    cfg.train.max_steps = 2
    cfg.train.ema_decay = 0.9
    cfg.train.log_dir = str(tmp_path / "runs")
    cfg.train.checkpoint_path = str(tmp_path / "ckpt")
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())

    cli_main(["train", "--config", cfg_path])

    from neural_image_compression_tpu.cli import _restore_params
    from neural_image_compression_tpu.utils.checkpoint import restore_raw

    model = build_model(cfg.model)
    params = _restore_params(model, cfg, np.zeros((1, 64, 64, 3), np.float32))
    assert "restored EMA params" in capsys.readouterr().out

    raw = restore_raw(cfg.train.checkpoint_path)
    import jax
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(raw["ema_params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
