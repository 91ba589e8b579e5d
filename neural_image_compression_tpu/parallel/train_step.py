"""Data-parallel train/eval steps over a device mesh.

Strategy (SURVEY §5, §7.2-7): the model is ~10-40M params — far under
per-chip HBM — so parameters are replicated and the batch is sharded over the
'data' axis. The step below is plain jit over sharded inputs: XLA partitions
the forward/backward per chip and inserts the gradient all-reduce (psum) over
ICI on its own. Multi-λ sweeps run this same step per λ; large-image eval can
additionally shard H over a 'spatial' axis (conv halo exchange is XLA's job).
"""

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from neural_image_compression_tpu.parallel.mesh import (
    batch_sharding, replicated, spatial_sharding,
)


def _norm(batch):
    # uint8 batches normalize on device (4x less host->device traffic; the
    # data.load_image uint8 fast path documents this contract)
    if batch.dtype == jnp.uint8:
        return batch.astype(jnp.float32) / 255.0
    return batch


def make_train_step(model, tx: optax.GradientTransformation, rd_loss: Callable,
                    lambda_val: float, mesh=None, donate: bool = True,
                    ema_decay: float = None, levels=None):
    """Build a jitted (optionally mesh-sharded) train step.

    Returns step(params, opt_state, batch, rng) -> (params, opt_state, metrics).
    With a mesh: params/opt_state replicated, batch sharded on 'data'.
    This is also the Trainer's step (single source of truth).

    With ema_decay in (0, 1), the step additionally threads an exponential
    moving average of the params (fused into the same program — one extra
    elementwise pass, no extra dispatch):
    step(params, opt_state, ema_params, batch, rng)
      -> (params, opt_state, ema_params, metrics)

    With levels (the lambda ladder of a variable-rate models.GainedJointAR),
    each step samples a level uniformly, forwards with that level's gain
    vectors, and weights the loss with levels[n] (lambda_val is unused).
    """
    if ema_decay is not None and not (0.0 < ema_decay < 1.0):
        raise ValueError(f"ema_decay must be in (0, 1), got {ema_decay}")
    lam_table = None if levels is None else jnp.asarray(levels, jnp.float32)

    def update(params, opt_state, batch, rng):
        batch = _norm(batch)
        if lam_table is None:
            kwargs, lam = {}, lambda_val
        else:
            rng, level_rng = jax.random.split(rng)
            n = jax.random.randint(level_rng, (), 0, lam_table.shape[0])
            kwargs, lam = {"level": n}, lam_table[n]

        def loss_fn(p):
            out = model.apply({"params": p}, batch, training=True,
                              rngs={"noise": rng}, **kwargs)
            metrics = rd_loss(out, batch, lam)
            return metrics["loss"], metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    if ema_decay is None:
        step = update
        n_state = 2
    else:
        def step(params, opt_state, ema_params, batch, rng):
            params, opt_state, metrics = update(params, opt_state, batch, rng)
            ema_params = jax.tree.map(
                lambda e, p: e + (1.0 - ema_decay) * (p - e).astype(e.dtype),
                ema_params, params)
            return params, opt_state, ema_params, metrics
        n_state = 3

    donate_argnums = tuple(range(n_state)) if donate else ()
    if mesh is None:
        return jax.jit(step, donate_argnums=donate_argnums)

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    if "model" in mesh.axis_names:
        # tensor-parallel: the caller device_puts state with parallel.tp
        # channel shardings; `None` in_shardings tell jit to take each
        # argument's sharding as-is (and donation keeps it across steps),
        # so one step function serves any dp x tp layout.
        return jax.jit(
            step,
            in_shardings=(None,) * n_state + (bsh, rep),
            donate_argnums=donate_argnums,
        )
    return jax.jit(
        step,
        in_shardings=(rep,) * n_state + (bsh, rep),
        out_shardings=(rep,) * (n_state + 1),
        donate_argnums=donate_argnums,
    )


def make_eval_step(model, mesh=None, spatial: bool = False):
    """Jitted eval forward; with a mesh, images are sharded across chips
    (embarrassingly-parallel Kodak eval), optionally also spatially."""

    def forward(params, batch):
        return model.apply({"params": params}, _norm(batch), training=False)

    if mesh is None:
        return jax.jit(forward)
    xsh = spatial_sharding(mesh) if spatial else batch_sharding(mesh)
    if "model" in mesh.axis_names:
        # params arrive tensor-parallel-sharded (parallel.tp.shard_params)
        return jax.jit(forward, in_shardings=(None, xsh))
    return jax.jit(forward, in_shardings=(replicated(mesh), xsh))


def shard_batch(batch, mesh):
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(tree, mesh):
    return jax.device_put(tree, replicated(mesh))
