"""A/B: deconv lowering choice in the TRAINING step (fwd+bwd), per mode.

Round 2 picked the per-shape deconv lowering (`_deconv_lowering_auto`) by
eval-forward A/B. Training autodiffs through whichever lowering the forward
used, and the two lowerings produce different backward programs (subpel:
dense-conv VJP + interleave transpose; dilated: lhs-dilated conv VJP), so
the eval-optimal choice is not automatically the train-optimal one. This
tool times the full donated train step with the lowering forced each way
(NIC_DECONV_LOWERING, read at trace time) and with the auto heuristic.

Run detached on the chip:
  PYTHONPATH=.:/root/.axon_site nohup python -u tools/ab_deconv_train.py &
"""

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import optax

M, K, BATCH, SIDE = 128, 3, 16, 256
ITERS = 150


def build_step(lowering):
    if lowering is None:
        os.environ.pop("NIC_DECONV_LOWERING", None)
    else:
        os.environ["NIC_DECONV_LOWERING"] = lowering
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

    return step, params, opt, x


def time_mode(lowering):
    step, p, o, x = build_step(lowering)
    p, o, m = step(p, o, x, jax.random.PRNGKey(0))
    float(m["loss"])  # compile + barrier
    t0 = time.perf_counter()
    for i in range(ITERS):
        p, o, m = step(p, o, x, jax.random.PRNGKey(i))
    float(m["loss"])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"lowering={str(lowering):8s}  {dt * 1e3:7.2f} ms/step  "
          f"({ITERS / (ITERS * dt):0.0f}.. {1 / dt:5.1f} steps/s)",
          flush=True)
    return dt


def main():
    for mode in ("dilated", "subpel", None):
        time_mode(mode)


if __name__ == "__main__":
    main()
