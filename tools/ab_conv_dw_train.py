"""A/B: patches-GEMM kernel-grad (NIC_CONV_DW) in the flagship train step.

The per-layer backward profile (tools/profile_bwd_layers.py) prices each
conv's filter-grad; this tool integrates the candidate fix — computing dW
as one (cin*k*k, B*H'*W') x (B*H'*W', cout) GEMM over extracted patches
instead of XLA's ConvBackpropFilter — into the full donated train step and
measures steps/s at batches 16 and 32:

  (unset)  = stock ConvBackpropFilter everywhere
  auto     = patches dW on lane-underfilled convs only (cin <= 16: the
             3->M RGB boundary layer)
  patches  = patches dW on every conv

Result goes into DESIGN.md next to the custom-dx probe (same
integrated-vs-isolated methodology; default only flips if the integrated
step wins at both batches).

Run detached on the chip (one TPU process at a time — CLAUDE.md):
  PYTHONPATH=.:/root/.axon_site nohup python -u tools/ab_conv_dw_train.py &
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
        os.environ.pop("NIC_CONV_DW", None)
    else:
        os.environ["NIC_CONV_DW"] = mode
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
    print(f"batch={batch:3d} dw={str(mode):8s}  {dt * 1e3:7.2f} ms/step  "
          f"({1 / dt:6.1f} steps/s, {batch / dt:6.0f} img/s)", flush=True)
    return dt


def main():
    for batch in (16, 32):
        for mode in (None, "auto", "patches"):
            time_mode(mode, batch)


if __name__ == "__main__":
    main()
