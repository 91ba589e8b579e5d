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


def test_vmapped_lambda_sweep():
    import jax
    import jax.numpy as jnp

    from neural_image_compression_tpu.train import vmapped_lambda_sweep
    from neural_image_compression_tpu.train.loss import rd_loss

    rng = np.random.RandomState(0)
    train = [rng.rand(2, 64, 64, 3).astype(np.float32) for _ in range(2)]
    model = FactorizedPrior(latent_channels=4)
    lambdas = [0.001, 0.05]
    per_lambda, losses = vmapped_lambda_sweep(model, lambdas, train, steps=8,
                                              learning_rate=1e-3)
    assert len(per_lambda) == 2
    assert losses.shape == (2,)
    assert np.all(np.isfinite(np.asarray(losses)))
    # the two replicas actually trained toward different objectives
    a = jax.tree.leaves(per_lambda[0])
    b = jax.tree.leaves(per_lambda[1])
    assert any(not np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(a, b))
    # each unstacked replica is a working parameter set
    x = jnp.asarray(train[0])
    out = model.apply({"params": per_lambda[0]}, x, training=False)
    assert np.isfinite(float(rd_loss(out, x, 0.001)["loss"]))


def test_vmapped_lambda_sweep_with_clip():
    from neural_image_compression_tpu.train import vmapped_lambda_sweep

    rng = np.random.RandomState(0)
    train = [rng.rand(2, 64, 64, 3).astype(np.float32) for _ in range(2)]
    model = FactorizedPrior(latent_channels=4)
    per_lambda, losses = vmapped_lambda_sweep(
        model, [0.001, 0.05], train, steps=6, learning_rate=1e-3,
        clip_grad_norm=1.0)
    assert len(per_lambda) == 2
    assert np.all(np.isfinite(np.asarray(losses)))


def test_vmapped_lambda_sweep_augment():
    """augment=True trains finitely and actually changes the data stream
    (different final params vs augment=False at equal seed/steps); the
    augmentation is on-device dihedral — the sweep contract (all replicas
    share each step's batch) is unchanged."""
    import jax

    from neural_image_compression_tpu.train import vmapped_lambda_sweep

    rng = np.random.RandomState(0)
    train = [rng.rand(2, 64, 64, 3).astype(np.float32) for _ in range(2)]
    model = FactorizedPrior(latent_channels=4)
    plain, l0 = vmapped_lambda_sweep(model, [0.01], train, steps=6,
                                     learning_rate=1e-3)
    auged, l1 = vmapped_lambda_sweep(model, [0.01], train, steps=6,
                                     learning_rate=1e-3, augment=True)
    assert np.all(np.isfinite(np.asarray(l1)))
    a = jax.tree.leaves(plain[0])
    b = jax.tree.leaves(auged[0])
    assert any(not np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(a, b))


def test_vmapped_sweep_augment_nonsquare():
    """Non-square patches skip the transpose leg but still flip finitely."""
    from neural_image_compression_tpu.train import vmapped_lambda_sweep

    rng = np.random.RandomState(1)
    train = [rng.rand(2, 64, 128, 3).astype(np.float32)]
    model = FactorizedPrior(latent_channels=4)
    _, losses = vmapped_lambda_sweep(model, [0.01], train, steps=4,
                                     learning_rate=1e-3, augment=True)
    assert np.all(np.isfinite(np.asarray(losses)))
