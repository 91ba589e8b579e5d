"""A/B: stride-2 first-conv lowering (plain vs space-to-depth) on the chip.

NEGATIVE RESULT (kept for reproducibility — don't re-try without new data).

The flagship's first conv (3->M, 5x5 s2 @512x768, batch 48) runs at
~17 TF/s with the plain lowering — cin=3 gives a 75-deep contraction and a
full-res spatial grid, both poor MXU fits. The classic fix is a
space-to-depth fold: 2x2 spatial phases into channels (3x3x12 kernel,
quarter grid, 108-deep contraction). Measured on the real v5e chip
(2026-08-17, batch 48 bf16):

    conv1 plain (3->128 @512x768)    5.01 ms
    conv1 s2d                        8.47 ms   <- LOSES
    max |diff|                       0.0156 (bf16 tolerance, exact math)

The fold's pad+reshape+transpose is a full extra HBM round-trip over the
largest tensor in the model, and XLA cannot fuse it into the conv; the
MXU win doesn't pay for the bandwidth. Same conclusion as the pallas
kernels (CLAUDE.md): XLA's native lowering wins at these sizes. The model
keeps plain conv2d(stride=2).

Run detached: nohup env PYTHONPATH=.:/root/.axon_site python -u \
    tools/ab_s2d_conv.py > /tmp/ab_s2d.log 2>&1 &
"""

import time
from typing import Optional

import jax
import jax.numpy as jnp

from neural_image_compression_tpu.ops.conv import _DIMENSION_NUMBERS, conv2d

BATCH = 48
DTYPE = jnp.bfloat16


def conv2d_s2d(x: jax.Array, kernel: jax.Array,
               bias: Optional[jax.Array] = None,
               padding: int = 2) -> jax.Array:
    """Stride-2 conv lowered space-to-depth: pad, fold 2x2 spatial phases
    into channels, and run a stride-1 VALID conv with the phase-expanded
    kernel. Mathematically identical to conv2d(stride=2) — tap (di, dj)
    with di=2u+a, dj=2v+b reads folded channel (a, b, c) at offset (u, v).
    Requires even H and W. Measured SLOWER than the plain lowering on v5e
    (see module docstring); lives in this tool only.
    """
    k = kernel.shape[0]
    cin, cout = kernel.shape[2], kernel.shape[3]
    kf = (k + 1) // 2  # folded kernel extent
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    b_, hp, wp, _ = xp.shape
    # fold: xf[i, j, (a*2+b)*cin + c] = xp[2i+a, 2j+b, c]
    xf = xp.reshape(b_, hp // 2, 2, wp // 2, 2, cin)
    xf = xf.transpose(0, 1, 3, 2, 4, 5).reshape(b_, hp // 2, wp // 2, 4 * cin)
    wf = jnp.zeros((kf, kf, 4 * cin, cout), kernel.dtype)
    for a in (0, 1):
        for b in (0, 1):
            for u in range((k - a + 1) // 2):
                for v in range((k - b + 1) // 2):
                    wf = wf.at[u, v, (a * 2 + b) * cin:(a * 2 + b + 1) * cin].set(
                        kernel[2 * u + a, 2 * v + b])
    out = jax.lax.conv_general_dilated(
        xf, wf, (1, 1), "VALID", dimension_numbers=_DIMENSION_NUMBERS)
    if bias is not None:
        out = out + bias
    return out


def timeit(fn, *args, iters=20, label=""):
    scalar_fn = jax.jit(lambda *a: jnp.sum(fn(*a)))
    _ = float(scalar_fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        scalar_fn(*args)
    _ = float(scalar_fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:40s} {dt*1000:8.2f} ms", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (BATCH, 512, 768, 3), DTYPE)
    ker = jax.random.normal(key, (5, 5, 3, 128), DTYPE) * 0.05
    b = jax.random.normal(key, (128,), DTYPE)

    timeit(lambda a, w, bb: conv2d(a, w, bb, stride=2, padding=2), x, ker, b,
           label="conv1 plain (3->128 @512x768)")
    timeit(lambda a, w, bb: conv2d_s2d(a, w, bb, padding=2), x, ker, b,
           label="conv1 s2d")

    # equivalence on device
    a0 = jax.jit(lambda a, w, bb: conv2d(a, w, bb, stride=2, padding=2))(x, ker, b)
    a1 = jax.jit(lambda a, w, bb: conv2d_s2d(a, w, bb, padding=2))(x, ker, b)
    print("max |diff|:", float(jnp.abs(
        a0.astype(jnp.float32) - a1.astype(jnp.float32)).max()))


if __name__ == "__main__":
    main()
