"""On-chip check of the vmapped RD-curve sweep: 4 λ replicas trained
simultaneously vs a single-λ baseline run — near-free extra λ's."""

import time

import jax
import jax.numpy as jnp

from neural_image_compression_tpu.models import JointAutoregressiveHierarchical
from neural_image_compression_tpu.train.sweep import vmapped_lambda_sweep

BATCH, SIZE, STEPS = 8, 256, 200


class DeviceBatches:
    """Fresh smooth synthetic batch per step, generated on device."""

    def __init__(self, n):
        self.n = n

    def __iter__(self):
        @jax.jit
        def make(key):
            base = jax.random.uniform(key, (BATCH, 16, 16, 3))
            img = jax.image.resize(base, (BATCH, SIZE, SIZE, 3), "linear")
            return jnp.clip(img + 0.05 * jax.random.normal(key, img.shape), 0, 1)

        for i in range(self.n):
            yield make(jax.random.PRNGKey(i))


def run(lambdas):
    model = JointAutoregressiveHierarchical(latent_channels=64, K=3,
                                            dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    per_lambda, losses = vmapped_lambda_sweep(
        model, lambdas, DeviceBatches(STEPS + 1), steps=STEPS)
    _ = [float(v) for v in losses]
    dt = time.perf_counter() - t0
    print(f"L={len(lambdas)}: {dt:.1f}s total, {STEPS/dt:.1f} steps/s, "
          f"losses={[round(float(v),3) for v in losses]}", flush=True)
    return dt


if __name__ == "__main__":
    t1 = run([0.005])
    t4 = run([0.001, 0.005, 0.02, 0.08])
    print(f"4-lambda sweep costs {t4/t1:.2f}x one run "
          f"(sequential would be 4.0x)", flush=True)
