"""A/B: stride-2 deconv lowering vs grid size at WIDE channel counts.

profile_layers at M=192 showed the subpel form winning M->M deconvs at
grids where the M=128-tuned `_deconv_lowering_auto` threshold
(in_h*in_w <= 2048) picks dilated (64x96: 7.01 vs 8.10 ms; 128x192:
21.10 vs 24.30 ms, batch 48). This maps the win region over
(channels, grid, batch) so the heuristic can be made channel-aware,
including the grids a larger-than-Kodak input would produce.

Run detached on the chip:
  PYTHONPATH=.:/root/.axon_site nohup python -u tools/ab_deconv_m192.py &
"""

import time

import jax
import jax.numpy as jnp

DTYPE = jnp.bfloat16


def t(fn, *args, iters=12):
    s = jax.jit(lambda *a: jnp.sum(fn(*a)))
    float(s(*args))
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        s(*args)
    float(s(*args))
    return (time.perf_counter() - t0) / iters


def main():
    from neural_image_compression_tpu.ops.conv import deconv2d, deconv2d_subpel

    key = jax.random.PRNGKey(0)
    for c in (128, 160, 192, 256):
        for (h, w) in ((32, 48), (64, 96), (128, 192), (256, 384)):
            for b in (1, 8, 48):
                if b * h * w * c > 48 * 128 * 192 * 256:
                    continue  # keep programs within the sweep budget
                wk = jax.random.normal(key, (5, 5, c, c), DTYPE) * 0.03
                x = jax.random.uniform(key, (b, h, w, c), DTYPE)
                td = t(lambda a, ww: deconv2d(a, ww, stride=2, padding=2,
                                              output_padding=1), x, wk)
                ts = t(lambda a, ww: deconv2d_subpel(a, ww, padding=2,
                                                     output_padding=1), x, wk)
                win = "subpel" if ts < td else "dilated"
                print(f"c={c:3d} grid={h:3d}x{w:3d} b={b:2d}  "
                      f"dilated {td*1e3:7.2f}  subpel {ts*1e3:7.2f}  -> {win}",
                      flush=True)


if __name__ == "__main__":
    main()
