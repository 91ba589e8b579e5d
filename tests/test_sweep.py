"""Multi-λ sweep: trains one tiny model per λ and emits an RD curve."""

import json
import os

import numpy as np

from neural_image_compression_tpu.models import FactorizedPrior
from neural_image_compression_tpu.train import lambda_sweep, plot_rd_curve


def test_lambda_sweep(tmp_path):
    rng = np.random.RandomState(0)
    train = [rng.rand(2, 192, 192, 3).astype(np.float32) for _ in range(2)]
    val = [rng.rand(1, 192, 192, 3).astype(np.float32)]

    points = lambda_sweep(lambda: FactorizedPrior(latent_channels=4),
                          train, val, lambdas=[0.001, 0.05], max_steps=3,
                          out_dir=str(tmp_path))
    assert len(points) == 2
    assert points[0]["bpp"] <= points[1]["bpp"]  # sorted by rate
    assert os.path.exists(tmp_path / "rd_curve.json")
    saved = json.load(open(tmp_path / "rd_curve.json"))
    assert {p["lambda"] for p in saved} == {0.001, 0.05}
    p = plot_rd_curve(points, str(tmp_path / "rd.png"))
    assert os.path.exists(p)
