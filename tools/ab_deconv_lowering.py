"""A/B the stride-2 deconv lowerings (lhs_dilation vs phase-combined subpel)
at the flagship decoder shapes. Run on the chip; batch via NIC_AB_BATCH.

Round-2 data (v5e) that set ops/conv.py's _deconv_lowering_auto heuristic:

  batch 48: 32x48 M->M   dilated 10.8 ms | subpel  3.8 ms   <- subpel
            64x96 M->M   dilated  6.0 ms | subpel  6.5 ms
            128x192 M->M dilated  9.7 ms | subpel 11.2 ms
            256x384 M->3 dilated 14.9 ms | subpel  8.9 ms   <- subpel
  batch 1:  dilated wins everywhere except 256x384 M->3
            (subpel 0.92 vs 1.60 ms) — dispatch-bound regime.
"""

import os
import time

import jax
import jax.numpy as jnp

from neural_image_compression_tpu.ops.conv import deconv2d, deconv2d_subpel

DT = jnp.bfloat16
B = int(os.environ.get("NIC_AB_BATCH", "48"))
SHAPES = [(32, 48, 128, 128), (64, 96, 128, 128), (128, 192, 128, 128),
          (256, 384, 128, 3)]


def timeit(fn, *args, iters=10):
    scalar = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(scalar(*args))
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        scalar(*args)
    float(scalar(*args))
    return (time.perf_counter() - t0) / iters


def main():
    for (h, w, ci, co) in SHAPES:
        k = jax.random.PRNGKey(0)
        x = jax.random.normal(k, (B, h, w, ci), DT)
        ker = jax.random.normal(k, (5, 5, ci, co), DT) * 0.05
        t1 = timeit(lambda x, k: deconv2d(x, k, stride=2, padding=2,
                                          output_padding=1), x, ker)
        t2 = timeit(lambda x, k: deconv2d_subpel(x, k, padding=2,
                                                 output_padding=1), x, ker)
        gf = 2 * B * h * w * 25 * ci * co / 1e9
        print(f"B{B} {h}x{w} {ci}->{co}: dilated {t1*1e3:7.2f} ms "
              f"({gf/t1/1e3:5.1f} TF/s) | subpel {t2*1e3:7.2f} ms "
              f"({gf/t2/1e3:5.1f} TF/s)")


if __name__ == "__main__":
    main()
