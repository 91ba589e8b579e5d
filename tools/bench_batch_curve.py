"""Eval-forward throughput vs batch size with the scalar-return methodology.

Same timed program as bench.py (PSNR keeps the decoder live; no large call
results cross the tunnel). One process, batches measured sequentially; each
batch recompiles once. Prints one line per batch and a peak summary.
"""

import os
import time

import jax
import jax.numpy as jnp

from neural_image_compression_tpu.models import JointAutoregressiveHierarchical
from neural_image_compression_tpu.train.loss import rd_loss

BATCHES = [int(b) for b in os.environ.get(
    "NIC_CURVE_BATCHES", "1,8,16,24,32,48,64,96").split(",")]
TARGET_IMGS = int(os.environ.get("NIC_CURVE_IMGS", "2304"))


def main():
    model = JointAutoregressiveHierarchical(latent_channels=128, K=3,
                                            dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def eval_step(params, x):
        out = model.apply({"params": params}, x, training=False)
        m = rd_loss(out, x, 0.005)
        return m["psnr"], m["bpp_total"]

    params = None
    results = []
    for b in BATCHES:
        x0 = jax.random.uniform(key, (b, 512, 768, 3), jnp.float32)
        if params is None:
            params = jax.jit(lambda k, x: model.init(
                {"params": k, "noise": k}, x, training=False))(key, x0)["params"]
        inputs = [jax.random.uniform(jax.random.PRNGKey(i), x0.shape,
                                     jnp.float32) for i in range(4)]
        psnr, bpp = eval_step(params, inputs[0])
        float(bpp)  # compile barrier (host fetch; block_until_ready lies here)
        iters = max(16, TARGET_IMGS // b)
        t0 = time.perf_counter()
        for i in range(iters):
            psnr, bpp = eval_step(params, inputs[i % 4])
        float(bpp)
        dt = time.perf_counter() - t0
        ips = iters * b / dt
        results.append((b, ips))
        print(f"batch {b:3d}: {ips:8.1f} img/s  ({dt/iters*1000:6.2f} ms/call)",
              flush=True)

    peak = max(results, key=lambda r: r[1])
    print(f"peak: batch {peak[0]} at {peak[1]:.1f} img/s")


if __name__ == "__main__":
    main()
