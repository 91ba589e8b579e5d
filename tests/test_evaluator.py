"""Evaluator integration: metrics, bpp reporting (bug-fix + reference field),
results artifact format."""

import os

import jax
import numpy as np
import pytest

from neural_image_compression_tpu.evaluation import (
    CompressionEvaluator, VisionCompressionEvaluator,
)
from neural_image_compression_tpu.models import (
    JointAutoregressiveHierarchical, ScalableImageCoding,
)

KEY = jax.random.PRNGKey(0)


def _loader(n=2, size=192, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.rand(1, size, size, 3).astype(np.float32) for _ in range(n)]


@pytest.fixture(scope="module")
def evaluator(tmp_path_factory):
    model = JointAutoregressiveHierarchical(latent_channels=8, K=1)
    x = np.zeros((1, 192, 192, 3), np.float32)
    params = model.init({"params": KEY, "noise": KEY}, x, training=False)["params"]
    save_dir = str(tmp_path_factory.mktemp("eval"))
    return CompressionEvaluator(model, params, _loader(), 0.005, save_dir)


def test_evaluate_metrics_and_bpp(evaluator):
    metrics, imgs, recons = evaluator.evaluate()
    for k in ("MSE(255)", "PSNR(RGB)", "MS-SSIM(RGB)", "PSNR(Y)", "MS-SSIM(Y)",
              "BPP", "BPP(y)", "BPP(z)", "BPP(reference_reported)"):
        assert k in metrics, k
    # fixed BPP is the true total; the reference-compat field equals BPP(y)
    assert abs(metrics["BPP"] - (metrics["BPP(y)"] + metrics["BPP(z)"])) < 1e-6
    assert metrics["BPP(reference_reported)"] == metrics["BPP(y)"]
    assert len(imgs) == len(recons) == 2
    assert 0 <= metrics["MS-SSIM(RGB)"] <= 1


def test_save_results_format(evaluator):
    metrics = {"PSNR(RGB)": 30.0, "BPP": 0.3}
    path = evaluator.save_results(metrics, nb_steps=100, caption="unit")
    lines = open(path).read().splitlines()
    assert lines[0] == "Lambda: 0.005"
    assert lines[1] == "Trained for: 100 steps"
    assert lines[2] == "PSNR(RGB): 30.000000"
    assert os.path.basename(path) == "eval_results_0.005_lambda_unit.txt"


def test_plot_samples_and_channels(evaluator):
    metrics, imgs, recons = evaluator.evaluate()
    paths = evaluator.plot_samples(imgs, recons, n=1, seed=0)
    assert all(os.path.exists(p) for p in paths)
    p = evaluator.plot_high_entropy_channel(imgs, seed=0)
    assert p and os.path.exists(p)


def test_gmm_channel_plot(tmp_path):
    model = JointAutoregressiveHierarchical(latent_channels=8, K=2)
    x = np.zeros((1, 192, 192, 3), np.float32)
    params = model.init({"params": KEY, "noise": KEY}, x, training=False)["params"]
    ev = CompressionEvaluator(model, params, _loader(n=1), 0.005, str(tmp_path))
    _, imgs, _ = ev.evaluate()
    p = ev.plot_high_entropy_channel(imgs, seed=0)
    assert p and os.path.exists(p)


def test_vision_evaluator(tmp_path):
    model = ScalableImageCoding(latent_channels=12, base_channels=8, K=1)
    x = np.zeros((1, 192, 192, 3), np.float32)
    params = model.init({"params": KEY, "noise": KEY}, x, training=False)["params"]
    ev = VisionCompressionEvaluator(model, params, _loader(n=2), 0.005, gamma=0.1,
                                    save_dir=str(tmp_path))
    metrics, imgs, recons = ev.evaluate()
    for k in ("BPP", "BPP(y1)", "BPP(y2)", "BPP(z)"):
        assert k in metrics
    assert abs(metrics["BPP"] -
               (metrics["BPP(y1)"] + metrics["BPP(y2)"] + metrics["BPP(z)"])) < 1e-6
    for layer in (1, 2):
        p = ev.plot_high_entropy_channel(imgs, latent_idx=layer, seed=0)
        assert p and os.path.exists(p)
    paths = ev.plot_samples(imgs, recons, n=1, seed=0)
    assert all(os.path.exists(p) for p in paths)


def test_evaluate_codec(tmp_path):
    from neural_image_compression_tpu.coding import JointARCodec

    model = JointAutoregressiveHierarchical(latent_channels=8, K=1)
    x = np.zeros((1, 192, 192, 3), np.float32)
    params = model.init({"params": KEY, "noise": KEY}, x, training=False)["params"]
    ev = CompressionEvaluator(model, params, _loader(n=1), 0.005, str(tmp_path))
    codec = JointARCodec(model, {"params": params})
    metrics = ev.evaluate_codec(codec)
    assert "BPP(bitstream)" in metrics and "BPP(analytic)" in metrics
    # real bitstream within a few % of analytic (header overhead on one image)
    assert metrics["BPP(bitstream)"] < metrics["BPP(analytic)"] * 1.10 + 0.02
    assert metrics["PSNR(RGB)"] > 0


def test_evaluate_codec_refined(tmp_path):
    """refine_steps routes encoding through refined latents +
    compress_latents; streams stay decodable and metrics finite."""
    from neural_image_compression_tpu.coding import JointARCodec

    model = JointAutoregressiveHierarchical(latent_channels=8, K=1)
    x = np.zeros((1, 192, 192, 3), np.float32)
    params = model.init({"params": KEY, "noise": KEY}, x,
                        training=False)["params"]
    ev = CompressionEvaluator(model, params, _loader(n=1), 0.005,
                              str(tmp_path))
    codec = JointARCodec(model, {"params": params})
    metrics = ev.evaluate_codec(codec, refine_steps=5, refine_lambda=0.005)
    assert np.isfinite(metrics["BPP(bitstream)"])
    assert metrics["PSNR(RGB)"] > 0
    with pytest.raises(ValueError, match="refine_lambda"):
        ev.evaluate_codec(codec, refine_steps=5)


def test_evaluate_codec_covers_full_batch(tmp_path):
    """A batch-N loader must not silently shrink the codec-evaluated set
    (every image goes through compress/decompress)."""
    from neural_image_compression_tpu.coding.codec import JointARCodec

    model = JointAutoregressiveHierarchical(latent_channels=8, K=1)
    x = np.zeros((1, 192, 192, 3), np.float32)
    params = model.init({"params": KEY, "noise": KEY}, x,
                        training=False)["params"]
    loader = [np.random.RandomState(0).rand(2, 192, 192, 3).astype(np.float32)]
    ev = CompressionEvaluator(model, params, loader, 0.005, str(tmp_path))
    codec = JointARCodec(model, {"params": params})

    calls = []
    orig_compress = codec.compress
    codec.compress = lambda img, **kw: (calls.append(img.shape),
                                        orig_compress(img, **kw))[1]
    metrics = ev.evaluate_codec(codec)
    assert len(calls) == 2
    assert all(shape[0] == 1 for shape in calls)
    assert metrics["BPP(bitstream)"] > 0
