"""A/B: PRNG implementation for the training noise stream.

NEGATIVE RESULT (v5e, 2026-08-19 — kept for reproducibility): the full
train step times IDENTICALLY under threefry and rbg noise keys (9.37 vs
9.37 ms/step) — inside the fused donated step XLA overlaps the threefry
draws with MXU work, so the isolated ~1.1 ms (profile_train, batch 32) is
already hidden. The isolated raw-draw programs here are tunnel-dispatch
bound (7-25 ms) and say nothing. The Trainer therefore keeps plain
threefry PRNGKeys (simpler checkpointing: raw uint32 arrays, no typed-key
serialization).

Times (a) the raw uniform draws per impl at the flagship latent shapes, and
(b) the full donated train step with the noise key built per impl.

Run detached on the chip:
  PYTHONPATH=.:/root/.axon_site nohup python -u tools/ab_noise_rng.py &
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import optax

M, K, BATCH, SIDE = 128, 3, 16, 256
ITERS = 150


def time_raw(impl):
    h = SIDE // 16
    key = jax.random.key(0, impl=impl)

    @jax.jit
    def draw(rng):
        return (jax.random.uniform(rng, (BATCH, h, h, M)).sum()
                + jax.random.uniform(jax.random.fold_in(rng, 1),
                                     (BATCH, h // 4, h // 4, M)).sum())

    float(draw(key))
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = draw(jax.random.fold_in(key, i))
    float(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"raw draws  impl={impl:12s} {dt * 1e3:7.3f} ms", flush=True)


def time_step(impl):
    from neural_image_compression_tpu.models import (
        JointAutoregressiveHierarchical,
    )
    from neural_image_compression_tpu.train.loss import rd_loss

    model = JointAutoregressiveHierarchical(latent_channels=M, K=K,
                                            dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (BATCH, SIDE, SIDE, 3), jnp.float32)
    params = jax.jit(lambda k, x: model.init({"params": k, "noise": k}, x,
                     training=True))(key, x)["params"]
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(p, o, x, rng):
        def loss_fn(q):
            out = model.apply({"params": q}, x, training=True,
                              rngs={"noise": rng})
            m = rd_loss(out, x, 0.005)
            return m["loss"], m

        (_, m), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, m

    nkey = jax.random.key(7, impl=impl)
    p, o, m = step(params, opt, x, nkey)
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(ITERS):
        p, o, m = step(p, o, x, jax.random.fold_in(nkey, i))
    float(m["loss"])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"train step impl={impl:12s} {dt * 1e3:7.2f} ms/step "
          f"({1 / dt:6.1f} steps/s)", flush=True)


def main():
    for impl in ("threefry2x32", "rbg", "unsafe_rbg"):
        time_raw(impl)
    for impl in ("threefry2x32", "rbg"):
        time_step(impl)


if __name__ == "__main__":
    main()


