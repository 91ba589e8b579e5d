"""A/B: masked-conv lowering (gather-GEMM vs mask-multiply conv) inside the
TRAINING step. The gather form won the eval A/B (2.97->2.45 ms, Kodak batch
48); its backward is slice-pad-adds + a concat split, which may price
differently. One timed full train step per variant, same shapes as
tools/profile_train.py. Run detached on the chip."""

import time
from functools import partial

import jax
import jax.numpy as jnp
import optax

import neural_image_compression_tpu.ops.masked_conv as mc
from neural_image_compression_tpu.models import JointAutoregressiveHierarchical
from neural_image_compression_tpu.train.loss import rd_loss

M, K, BATCH, SIDE = 128, 3, 32, 256


def time_step():
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
        def loss_fn(pp):
            out = model.apply({"params": pp}, x, training=True,
                              rngs={"noise": rng})
            return rd_loss(out, x, 0.005)["loss"]

        l, g = jax.value_and_grad(loss_fn)(p)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), o, l

    p, o = params, opt
    p, o, l = step(p, o, x, jax.random.PRNGKey(0))
    _ = float(l)
    iters = 60
    t0 = time.perf_counter()
    for i in range(iters):
        p, o, l = step(p, o, x, jax.random.PRNGKey(i))
    _ = float(l)
    return (time.perf_counter() - t0) / iters


def main():
    import sys
    order = [("gather-GEMM (current)", 4096), ("mask-multiply conv", 0)]
    if "--reverse" in sys.argv:
        order = order[::-1]
    order = order + order  # run each twice: 2nd pass is the warm number
    for label, thresh in order:
        mc.GATHER_GEMM_MAX_GRID = thresh
        t = time_step()
        print(f"{label:24s} {t*1e3:7.2f} ms/step  ({BATCH/t:6.0f} img/s)",
              flush=True)


if __name__ == "__main__":
    main()
