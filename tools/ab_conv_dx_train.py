"""A/B: custom subpel input-grad for stride-2 convs in the train step.

NEGATIVE RESULT (v5e, 2026-08-19 — kept for reproducibility): the custom
subpel input-grad rule LOSES integrated into the flagship train step at
both batches (batch 16: stock 9.10 ms/step, heuristic mix 9.38, subpel
everywhere 10.68; batch 32: 19.67 / 20.38 / 23.00) even though the subpel
lowering wins the identical computation as an eval-side forward deconv —
the stock rule's cotangent convs fuse into the surrounding backward,
the custom-VJP boundary's don't. conv2d therefore defaults to the stock
rule; the hook stays for re-testing on new hardware/compilers
(NIC_CONV_DX, read at trace time):

  dilated = stock XLA transpose rule everywhere (the shipped default)
  subpel  = custom rule on every legal stride-2 conv
  auto    = per-shape eval heuristic picks per conv

Run detached on the chip:
  PYTHONPATH=.:/root/.axon_site nohup python -u tools/ab_conv_dx_train.py &
"""

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import optax

M, K, SIDE = 128, 3, 256
ITERS = 150


def build_step(mode, batch):
    if mode is None:
        os.environ.pop("NIC_CONV_DX", None)
    else:
        os.environ["NIC_CONV_DX"] = mode
    from neural_image_compression_tpu.models import (
        JointAutoregressiveHierarchical,
    )
    from neural_image_compression_tpu.train.loss import rd_loss

    model = JointAutoregressiveHierarchical(latent_channels=M, K=K,
                                            dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (batch, SIDE, SIDE, 3), jnp.float32)
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


def time_mode(mode, batch):
    step, p, o, x = build_step(mode, batch)
    p, o, m = step(p, o, x, jax.random.PRNGKey(0))
    float(m["loss"])  # compile + barrier
    t0 = time.perf_counter()
    for i in range(ITERS):
        p, o, m = step(p, o, x, jax.random.PRNGKey(i))
    float(m["loss"])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"batch={batch:3d} dx={str(mode):8s}  {dt * 1e3:7.2f} ms/step  "
          f"({1 / dt:6.1f} steps/s, {batch / dt:6.0f} img/s)", flush=True)
    return dt


def main():
    for batch in (16, 32):
        for mode in ("dilated", "subpel", "auto"):
            time_mode(mode, batch)


if __name__ == "__main__":
    main()
