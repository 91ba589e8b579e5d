"""Hardware smoke for every model family: a short on-device-data training run
per family on the real chip, verifying loss decreases and grads are finite.
(CPU tests cover these paths already; this proves them on TPU.)"""

import time

import jax
import jax.numpy as jnp
import optax

from neural_image_compression_tpu.models import (
    FactorizedPrior, HierarchicalMixtureResidual, JointAutoregressiveHierarchical,
    ScalableImageCoding,
)
from neural_image_compression_tpu.train.loss import rd_loss, vision_rd_loss

BATCH, SIZE = 8, 256


@jax.jit
def make_batch(key):
    base = jax.random.uniform(key, (BATCH, 16, 16, 3))
    img = jax.image.resize(base, (BATCH, SIZE, SIZE, 3), "linear")
    return jnp.clip(img + 0.05 * jax.random.normal(key, img.shape), 0, 1)


def run(name, model, loss_fn, steps=300):
    key = jax.random.PRNGKey(0)
    x0 = make_batch(key)
    params = jax.jit(lambda k, x: model.init(
        {"params": k, "noise": k}, x, training=True))(key, x0)["params"]
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, batch, rng):
        def lf(p):
            out = model.apply({"params": p}, batch, training=True,
                              rngs={"noise": rng})
            return loss_fn(out, batch)

        l, g = jax.value_and_grad(lf)(params)
        u, opt = tx.update(g, opt)
        return optax.apply_updates(params, u), opt, l

    rng = jax.random.PRNGKey(1)
    params, opt, l = step(params, opt, x0, rng)
    first = float(l)
    t0 = time.perf_counter()
    for i in range(steps):
        rng, r1, r2 = jax.random.split(rng, 3)
        params, opt, l = step(params, opt, make_batch(r1), r2)
    last = float(l)
    dt = time.perf_counter() - t0
    ok = last < first and jnp.isfinite(last)
    print(f"{name:28s} loss {first:9.3f} -> {last:7.3f}  "
          f"{steps/dt:6.1f} steps/s  {'OK' if ok else 'FAIL'}", flush=True)
    return ok


def main():
    results = [
        run("joint_ar 5x5 (K=3)",
            JointAutoregressiveHierarchical(latent_channels=64, K=3, dtype=jnp.bfloat16),
            lambda out, x: rd_loss(out, x, 0.005)["loss"]),
        run("residual 3x3 (K=2)",
            HierarchicalMixtureResidual(latent_channels=64, K=2, dtype=jnp.bfloat16),
            lambda out, x: rd_loss(out, x, 0.005)["loss"]),
        run("factorized_prior",
            FactorizedPrior(latent_channels=64, dtype=jnp.bfloat16),
            lambda out, x: rd_loss(out, x, 0.005)["loss"]),
        run("scalable (vision loss)",
            ScalableImageCoding(latent_channels=64, base_channels=48, K=1,
                                dtype=jnp.bfloat16),
            lambda out, x: vision_rd_loss(out, x, 0.005, 0.0)["loss"]),
    ]
    print("ALL FAMILIES:", "OK" if all(results) else "FAIL", flush=True)


if __name__ == "__main__":
    main()
