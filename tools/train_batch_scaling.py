"""Training throughput vs batch size for the flagship config (on-device data),
and HBM headroom check. Informs the recommended per-chip batch."""

import time

import jax
import jax.numpy as jnp
import optax

from neural_image_compression_tpu.models import JointAutoregressiveHierarchical
from neural_image_compression_tpu.train.loss import rd_loss

M, K, SIZE = 128, 3, 256


def run(batch: int, steps: int = 60):
    model = JointAutoregressiveHierarchical(latent_channels=M, K=K,
                                            dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_batch(key):
        base = jax.random.uniform(key, (batch, 16, 16, 3))
        img = jax.image.resize(base, (batch, SIZE, SIZE, 3), "linear")
        return jnp.clip(img + 0.05 * jax.random.normal(key, img.shape), 0, 1)

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
            return rd_loss(out, batch, 0.005)["loss"]

        l, g = jax.value_and_grad(lf)(params)
        u, opt = tx.update(g, opt)
        return optax.apply_updates(params, u), opt, l

    rng = jax.random.PRNGKey(1)
    params, opt, l = step(params, opt, x0, rng)
    _ = float(l)
    t0 = time.perf_counter()
    for i in range(steps):
        rng, r1, r2 = jax.random.split(rng, 3)
        params, opt, l = step(params, opt, make_batch(r1), r2)
    _ = float(l)
    dt = (time.perf_counter() - t0) / steps
    print(f"batch {batch:3d}: {1/dt:7.2f} steps/s  {batch/dt:8.1f} img/s "
          f"({dt*1000:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    for b in (16, 32, 64, 128):
        try:
            run(b)
        except Exception as e:  # likely OOM at some batch
            print(f"batch {b}: FAILED: {type(e).__name__} {str(e)[:120]}",
                  flush=True)
            break
