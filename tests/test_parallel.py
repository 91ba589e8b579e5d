"""Multi-device (virtual 8-CPU mesh) sharding tests + graft entry points."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from neural_image_compression_tpu.models import JointAutoregressiveHierarchical
from neural_image_compression_tpu.parallel import (
    make_eval_step, make_mesh, make_train_step, replicate, shard_batch,
)
from neural_image_compression_tpu.train.loss import rd_loss

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def _setup(n=8, m=8):
    mesh = make_mesh(n)
    model = JointAutoregressiveHierarchical(latent_channels=m, K=1)
    key = jax.random.PRNGKey(0)
    batch = jax.random.uniform(key, (n, 64, 64, 3))
    params = model.init({"params": key, "noise": key}, batch[:1], training=True)["params"]
    tx = optax.adam(1e-3)
    return mesh, model, tx, params, tx.init(params), batch


def test_dp_train_step_runs_and_matches_single_device():
    mesh, model, tx, params, opt_state, batch = _setup()
    # sharded step
    p_sh = replicate(params, mesh)
    o_sh = replicate(opt_state, mesh)
    b_sh = shard_batch(batch, mesh)
    step_sh = make_train_step(model, tx, rd_loss, 0.005, mesh=mesh, donate=False)
    p1, _, m1 = step_sh(p_sh, o_sh, b_sh, jax.random.PRNGKey(1))
    # single-device step on the same full batch
    step_1 = make_train_step(model, tx, rd_loss, 0.005, mesh=None, donate=False)
    p2, _, m2 = step_1(params, opt_state, batch, jax.random.PRNGKey(1))
    # identical math (same rng, full batch either way)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_batch_is_actually_sharded():
    mesh, model, tx, params, opt_state, batch = _setup()
    b_sh = shard_batch(batch, mesh)
    assert len(b_sh.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in b_sh.addressable_shards}
    assert shard_shapes == {(1, 64, 64, 3)}


def test_eval_step_sharded():
    mesh, model, tx, params, opt_state, batch = _setup()
    fwd = make_eval_step(model, mesh=mesh)
    out = fwd(replicate(params, mesh), shard_batch(batch, mesh))
    assert out["x_hat"].shape == batch.shape
    assert np.isfinite(np.asarray(out["x_hat"])).all()


def test_spatial_mesh():
    mesh = make_mesh(8, spatial=4)
    assert mesh.axis_names == ("data", "spatial")
    assert mesh.devices.shape == (2, 4)


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    x_hat, bpp, psnr = jax.jit(fn)(*args)
    assert x_hat.shape == (1, 256, 256, 3)
    assert np.isfinite(float(bpp)) and np.isfinite(float(psnr))


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_init_distributed_noop():
    # single-process environment: must not raise
    from neural_image_compression_tpu.parallel import init_distributed
    init_distributed()


def test_tp_mesh():
    mesh = make_mesh(8, model=4)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (2, 4)
    mesh3 = make_mesh(8, spatial=2, model=2)
    assert mesh3.axis_names == ("data", "spatial", "model")
    assert mesh3.devices.shape == (2, 2, 2)


def test_tp_params_actually_sharded():
    from neural_image_compression_tpu.parallel import shard_params

    mesh, model, tx, params, opt_state, batch = _setup()
    p_tp = shard_params(params, mesh)  # no 'model' axis -> replicated
    k = p_tp["encoder"]["Conv2d_1"]["kernel"]
    assert k.sharding.is_fully_replicated

    mesh_tp = make_mesh(8, model=4)
    p_tp = shard_params(params, mesh_tp)
    k = p_tp["encoder"]["Conv2d_1"]["kernel"]  # (5,5,8,8): cout sharded
    assert {s.data.shape for s in k.addressable_shards} == {(5, 5, 8, 2)}
    rgb = p_tp["decoder"]["Deconv2d_3"]["kernel"]  # cout=3: replicated
    assert rgb.sharding.is_fully_replicated
    fb = p_tp["factorized_entropy_model"]["matrix_1"]  # channel axis 0
    assert {s.data.shape for s in fb.addressable_shards} == {(2, 3, 3)}
    # optimizer state follows the same rule (scalars replicated)
    o_tp = shard_params(opt_state, mesh_tp)
    mu = o_tp[0].mu["encoder"]["Conv2d_1"]["kernel"]
    assert {s.data.shape for s in mu.addressable_shards} == {(5, 5, 8, 2)}


def test_tp_eval_matches_unsharded():
    from neural_image_compression_tpu.parallel import shard_params

    mesh = make_mesh(8, model=4)
    _, model, tx, params, opt_state, batch = _setup()
    fwd = make_eval_step(model, mesh=mesh)
    out = fwd(shard_params(params, mesh), shard_batch(batch, mesh))
    ref = jax.jit(lambda p, x: model.apply({"params": p}, x, training=False))(
        params, batch)
    for k in ("x_hat", "y_in", "z_in", "logp_y", "logp_z"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_tp_train_step_matches_single_device():
    from neural_image_compression_tpu.parallel import shard_params

    mesh = make_mesh(8, spatial=1, model=2)  # (data 4, model 2)
    _, model, tx, params, opt_state, batch = _setup()
    step_tp = make_train_step(model, tx, rd_loss, 0.005, mesh=mesh,
                              donate=False)
    p1, _, m1 = step_tp(shard_params(params, mesh),
                        shard_params(opt_state, mesh),
                        shard_batch(batch, mesh), jax.random.PRNGKey(1))
    step_1 = make_train_step(model, tx, rd_loss, 0.005, mesh=None,
                             donate=False)
    p2, _, m2 = step_1(params, opt_state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
    # params keep their tp sharding across the step (donation-stable)
    k1 = p1["encoder"]["Conv2d_1"]["kernel"]
    assert not k1.sharding.is_fully_replicated


def test_spatial_sharded_eval():
    from neural_image_compression_tpu.parallel import make_eval_step, replicate
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(8, spatial=4)
    model = JointAutoregressiveHierarchical(latent_channels=8, K=1)
    key = jax.random.PRNGKey(0)
    # 2 images sharded over data(2) x spatial(4): H=512 -> 128 rows/device
    batch = jax.random.uniform(key, (2, 512, 256, 3))
    params = model.init({"params": key, "noise": key}, batch[:1], training=True)["params"]
    fwd = make_eval_step(model, mesh=mesh, spatial=True)
    xsh = jax.device_put(batch, NamedSharding(mesh, P("data", "spatial")))
    out = fwd(replicate(params, mesh), xsh)
    assert out["x_hat"].shape == batch.shape
    # matches the unsharded forward (XLA handles conv halo exchange)
    ref = jax.jit(lambda p, x: model.apply({"params": p}, x, training=False))(params, batch)
    np.testing.assert_allclose(np.asarray(out["x_hat"]), np.asarray(ref["x_hat"]),
                               rtol=2e-4, atol=2e-5)


def test_spatial_sharded_eval_channel_cb():
    """The group context convs (channel + spatial) halo-exchange correctly
    under spatial sharding: sharded eval == unsharded for the ELIC-style
    family too (likelihoods, not just pixels — context flows cross-shard)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from neural_image_compression_tpu.models import (
        ChannelCheckerboardHierarchical,
    )
    from neural_image_compression_tpu.parallel import make_eval_step, replicate

    mesh = make_mesh(8, spatial=4)
    model = ChannelCheckerboardHierarchical(latent_channels=16, K=1)
    key = jax.random.PRNGKey(0)
    batch = jax.random.uniform(key, (2, 512, 256, 3))
    params = model.init({"params": key, "noise": key}, batch[:1],
                        training=True)["params"]
    fwd = make_eval_step(model, mesh=mesh, spatial=True)
    xsh = jax.device_put(batch, NamedSharding(mesh, P("data", "spatial")))
    out = fwd(replicate(params, mesh), xsh)
    ref = jax.jit(lambda p, x: model.apply({"params": p}, x,
                                           training=False))(params, batch)
    for k in ("x_hat", "y_in", "z_in", "logp_y", "logp_z"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
