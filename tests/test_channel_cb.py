"""Channel-conditional + checkerboard (ELIC-style SCCTX) context model.

Load-bearing properties: (1) group causality — group-i anchor params depend
on z + groups < i only; group-i non-anchor params additionally on group-i
anchors only; (2) the one-program training forward is pointwise-equal to the
per-group decode passes the codec runs; (3) the family plugs into
Trainer/config unchanged."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from neural_image_compression_tpu.models import (
    ChannelCheckerboardHierarchical, checkerboard_mask, default_groups,
)
from neural_image_compression_tpu.train.loss import rd_loss

KEY = jax.random.PRNGKey(0)


def _init(model, shape=(1, 64, 64, 3)):
    x = jnp.zeros(shape, jnp.float32)
    return model.init({"params": KEY, "noise": KEY}, x, training=False)["params"]


@pytest.fixture(scope="module")
def ccb_k1():
    model = ChannelCheckerboardHierarchical(latent_channels=16, K=1)
    return model, _init(model)


@pytest.fixture(scope="module")
def ccb_k3():
    model = ChannelCheckerboardHierarchical(latent_channels=16, K=3)
    return model, _init(model)


def test_default_groups():
    assert default_groups(128) == (16, 16, 32, 64)
    assert default_groups(192) == (24, 24, 48, 96)
    assert default_groups(16) == (2, 2, 4, 8)
    assert sum(default_groups(13)) == 13          # remainder joins the last
    assert default_groups(3) == (3,)              # degenerates to one group
    assert sum(default_groups(8)) == 8
    with pytest.raises(ValueError):
        default_groups(0)


def test_bad_groups_rejected():
    with pytest.raises(ValueError):
        ChannelCheckerboardHierarchical(latent_channels=16,
                                        groups=(8, 4)).init(
            {"params": KEY, "noise": KEY}, jnp.zeros((1, 64, 64, 3)),
            training=False)


def test_forward_contract(ccb_k1, ccb_k3):
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    for (model, params), extra in ((ccb_k1, ("mu", "sigma")),
                                   (ccb_k3, ("weights", "mus", "sigmas"))):
        out = model.apply({"params": params}, x, training=False)
        for k in ("x_hat", "y", "y_in", "z", "z_in", "p_y", "logp_y",
                  "p_z", "logp_z") + extra:
            assert k in out, k
        assert out["x_hat"].shape == x.shape
        assert out["y_in"].shape[-1] == 16
        assert np.isfinite(np.asarray(out["x_hat"])).all()
        # param channel layout reassembles to M on the last axis
        assert out[extra[-1]].shape[-1] == 16
        out_t = model.apply({"params": params}, x, training=True,
                            rngs={"noise": KEY})
        assert np.isfinite(np.asarray(out_t["p_y"])).all()


def _ep(model, params, y, z):
    return model.apply({"params": params}, y, z,
                       method=lambda m, a, b: m.entropy_params_from_latents(a, b))


def test_group_causality(ccb_k1):
    """For each group i (sizes (2,2,4,8) at M=16): anchor params ignore
    everything but z and groups < i; non-anchor params additionally see only
    group-i ANCHORS; and the context is live (earlier groups do change
    group-i params)."""
    model, params = ccb_k1
    groups = (2, 2, 4, 8)
    h = w = 8
    am = checkerboard_mask(h, w)
    y = jnp.round(jax.random.normal(jax.random.PRNGKey(2), (1, h, w, 16)) * 3)
    z = jnp.round(jax.random.normal(jax.random.PRNGKey(3), (1, 2, 2, 16)) * 2)
    mu0, sig0 = (np.asarray(v)[0] for v in _ep(model, params, y, z))

    off = 0
    for i, gi in enumerate(groups):
        sl = slice(off, off + gi)
        # 1) perturb group i + all later groups everywhere -> group-i ANCHOR
        #    params unchanged
        y_pert = y.at[..., off:].add(7.0)
        mu1, _ = (np.asarray(v)[0] for v in _ep(model, params, y_pert, z))
        np.testing.assert_array_equal(mu1[am][:, sl], mu0[am][:, sl])

        # 2) perturb group i ONLY at non-anchors (+ later groups everywhere)
        #    -> group-i NON-ANCHOR params unchanged
        mask = jnp.asarray(am)[None, :, :, None]
        y_pert2 = jnp.concatenate([
            y[..., :off],
            jnp.where(mask, y[..., sl], y[..., sl] + 7.0),
            y[..., off + gi:] + 7.0,
        ], axis=-1)
        mu2, _ = (np.asarray(v)[0] for v in _ep(model, params, y_pert2, z))
        np.testing.assert_array_equal(mu2[~am][:, sl], mu0[~am][:, sl])

        # 3) liveness: perturbing group i-1 changes group-i params somewhere
        if i > 0:
            prev = slice(off - groups[i - 1], off)
            y_pert3 = y.at[..., prev].add(1.0)
            mu3, _ = (np.asarray(v)[0] for v in _ep(model, params, y_pert3, z))
            assert not np.array_equal(mu3[:, :, sl], mu0[:, :, sl])
        off += gi

    # spatial context live within a group: anchor change moves non-anchor
    # params of the SAME group
    y_pert4 = y.at[..., 0:2].add(
        jnp.where(jnp.asarray(am)[None, :, :, None], 1.0, 0.0))
    mu4, _ = (np.asarray(v)[0] for v in _ep(model, params, y_pert4, z))
    assert not np.array_equal(mu4[~am][:, 0:2], mu0[~am][:, 0:2])


@pytest.mark.parametrize("fixture", ["ccb_k1", "ccb_k3"])
def test_per_group_passes_equal_training_forward(fixture, request):
    """group_params (the codec programs: anchor then non-anchor, per group,
    channel ctx computed once per group) reproduce the one-program forward's
    params at their positions."""
    model, params = request.getfixturevalue(fixture)
    groups = (2, 2, 4, 8)
    h = w = 8
    am = checkerboard_mask(h, w)
    y = jnp.round(jax.random.normal(jax.random.PRNGKey(7), (1, h, w, 16)) * 3)
    z = jnp.round(jax.random.normal(jax.random.PRNGKey(8), (1, 2, 2, 16)) * 2)

    full = _ep(model, params, y, z)
    psi = model.apply({"params": params}, z,
                      method=lambda m, zz: m.hyper_features(zz))

    off = 0
    for i, gi in enumerate(groups):
        sl = slice(off, off + gi)
        y_prev = y[..., :off] if i > 0 else None
        ch = model.apply({"params": params}, i, y_prev,
                         method=lambda m, a, b: m.group_channel_ctx(a, b))
        pa = model.apply({"params": params}, i, psi, ch, None,
                         method=lambda m, a, b, c, d: m.group_params(a, b, c, d))
        ya = jnp.where(jnp.asarray(am)[None, :, :, None], y[..., sl], 0.0)
        pna = model.apply({"params": params}, i, psi, ch, ya,
                          method=lambda m, a, b, c, d: m.group_params(a, b, c, d))
        for want, got_a, got_na in zip(full, pa, pna):
            w_g = np.asarray(want)[0][..., sl]
            np.testing.assert_allclose(np.asarray(got_a)[0][am], w_g[am],
                                       rtol=1e-6, atol=1e-7)
            np.testing.assert_allclose(np.asarray(got_na)[0][~am], w_g[~am],
                                       rtol=1e-6, atol=1e-7)
        off += gi


def test_training_step_runs_and_ctx_gets_gradients(ccb_k1):
    model, params = ccb_k1
    from neural_image_compression_tpu.parallel.train_step import make_train_step

    params = jax.tree_util.tree_map(jnp.array, params)  # step donates
    init_sp = np.asarray(params["spatial_ctx_1"]["kernel"]).copy()
    init_ch = np.asarray(
        params["channel_ctx_1"]["Conv2d_0"]["kernel"]).copy()
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, rd_loss, 0.01)
    x = jax.random.uniform(jax.random.PRNGKey(9), (2, 64, 64, 3))
    losses = []
    for i in range(5):
        params, opt_state, m = step(params, opt_state, x, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert not np.allclose(np.asarray(params["spatial_ctx_1"]["kernel"]),
                           init_sp)
    assert not np.allclose(
        np.asarray(params["channel_ctx_1"]["Conv2d_0"]["kernel"]), init_ch)


def test_build_model_and_alias():
    from neural_image_compression_tpu.config import ModelConfig, build_model

    for name in ("channel_cb", "elic"):
        model = build_model(ModelConfig(name=name, latent_channels=16, K=1))
        assert isinstance(model, ChannelCheckerboardHierarchical)


def test_size_guard(ccb_k1):
    model, params = ccb_k1
    with pytest.raises(ValueError, match="multiples of 64"):
        model.apply({"params": params},
                    jnp.zeros((1, 96, 64, 3)), training=False)
