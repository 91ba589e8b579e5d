"""TPU training throughput + learning sanity run for the flagship config.

Trains JointAutoregressiveHierarchical(M=128, K=3) — the reference's
published setup (batch 16, 256^2 patches, Adam 1e-4, lambda=0.005,
Main.ipynb cell 6) — on synthetic piecewise-smooth images (no real datasets
in this air-gapped environment), measuring steps/sec and confirming the RD
loss decreases. Single process; scalar fetches as barriers (see CLAUDE.md).
"""

import json
import time

import jax
import jax.numpy as jnp
import optax

from neural_image_compression_tpu.models import JointAutoregressiveHierarchical
from neural_image_compression_tpu.train.loss import rd_loss

BATCH, SIZE, M, K = 16, 256, 128, 3
STEPS = int(__import__("os").environ.get("DEMO_STEPS", "200"))
DTYPE = jnp.bfloat16


@jax.jit
def make_batch(key):
    """Smooth random images: low-res noise bilinearly upsampled + detail."""
    k1, k2, k3 = jax.random.split(key, 3)
    base = jax.random.uniform(k1, (BATCH, 16, 16, 3))
    img = jax.image.resize(base, (BATCH, SIZE, SIZE, 3), "linear")
    detail = 0.05 * jax.random.normal(k2, (BATCH, SIZE, SIZE, 3))
    mid = jax.image.resize(jax.random.uniform(k3, (BATCH, 64, 64, 3)),
                           (BATCH, SIZE, SIZE, 3), "linear")
    return jnp.clip(0.6 * img + 0.35 * mid + detail, 0.0, 1.0)


def main():
    model = JointAutoregressiveHierarchical(latent_channels=M, K=K, dtype=DTYPE)
    key = jax.random.PRNGKey(0)
    x0 = make_batch(key)
    params = jax.jit(lambda k, x: model.init(
        {"params": k, "noise": k}, x, training=True))(key, x0)["params"]
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            out = model.apply({"params": p}, batch, training=True,
                              rngs={"noise": rng})
            m = rd_loss(out, batch, 0.005)
            return m["loss"], m

        (_, m), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, u), opt_state, m

    # compile
    rng = jax.random.PRNGKey(1)
    params, opt_state, m = step(params, opt_state, x0, rng)
    first_loss = float(m["loss"])
    print(f"step 0: loss={first_loss:.3f} bpp={float(m['bpp_total']):.3f} "
          f"psnr={float(m['psnr']):.2f}", flush=True)

    t0 = time.perf_counter()
    for i in range(1, STEPS + 1):
        rng, krng, brng = jax.random.split(rng, 3)
        batch = make_batch(brng)
        params, opt_state, m = step(params, opt_state, batch, krng)
        if i % 50 == 0:
            loss = float(m["loss"])  # barrier
            dt = time.perf_counter() - t0
            print(f"step {i}: loss={loss:.3f} bpp={float(m['bpp_total']):.3f} "
                  f"psnr={float(m['psnr']):.2f}  ({i/dt:.2f} steps/s)", flush=True)
    last_loss = float(m["loss"])
    dt = time.perf_counter() - t0
    if __import__("os").environ.get("DEMO_SAVE"):
        from neural_image_compression_tpu.utils.checkpoint import save_checkpoint
        save_checkpoint(__import__("os").environ["DEMO_SAVE"],
                        {"params": params}, {"steps": STEPS})
        print("saved checkpoint ->", __import__("os").environ["DEMO_SAVE"], flush=True)
    result = {
        "steps_per_sec": round(STEPS / dt, 3),
        "images_per_sec": round(STEPS * BATCH / dt, 1),
        "first_loss": round(first_loss, 3),
        "last_loss": round(last_loss, 3),
        "loss_decreased": last_loss < first_loss,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
