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
                    lambda_val: float, mesh=None, donate: bool = True):
    """Build a jitted (optionally mesh-sharded) train step.

    Returns step(params, opt_state, batch, rng) -> (params, opt_state, metrics).
    With a mesh: params/opt_state replicated, batch sharded on 'data'.
    This is also the Trainer's step (single source of truth).
    """

    def step(params, opt_state, batch, rng):
        batch = _norm(batch)

        def loss_fn(p):
            out = model.apply({"params": p}, batch, training=True, rngs={"noise": rng})
            metrics = rd_loss(out, batch, lambda_val)
            return metrics["loss"], metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    donate_argnums = (0, 1) if donate else ()
    if mesh is None:
        return jax.jit(step, donate_argnums=donate_argnums)

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, rep, bsh, rep),
        out_shardings=(rep, rep, rep),
        donate_argnums=donate_argnums,
    )


def make_eval_step(model, mesh=None, spatial: bool = False):
    """Jitted eval forward; with a mesh, images are sharded across chips
    (embarrassingly-parallel Kodak eval), optionally also spatially."""

    def forward(params, batch):
        return model.apply({"params": params}, _norm(batch), training=False)

    if mesh is None:
        return jax.jit(forward)
    rep = replicated(mesh)
    xsh = spatial_sharding(mesh) if spatial else batch_sharding(mesh)
    return jax.jit(forward, in_shardings=(rep, xsh))


def shard_batch(batch, mesh):
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(tree, mesh):
    return jax.device_put(tree, replicated(mesh))
