"""Per-layer timing of the flagship transforms on the real chip.

Breaks the encoder / decoder / hyper nets of
JointAutoregressiveHierarchical(M=128, K=3) into individual jitted
conv/GDN stages at batch NIC_PROFILE_BATCH (default 48) to see which layer
holds the MFU back; times both stride-2 deconv lowerings per layer.
Scalar-return timing per the tunnel methodology (CLAUDE.md).

Measured 2026-08-17 (real v5e, batch 48 bf16):

    enc conv5x5 s2 3->128 @512x768     5.45 ms    16.6 TF/s  (thin cin)
    enc conv5x5 s2 128->128 @256x384   7.96 ms   121.3 TF/s
    enc conv5x5 s2 128->128 @128x192   7.99 ms    30.3 TF/s
    enc conv5x5 s2 128->128 @64x96     4.63 ms    13.0 TF/s
    GDN M=128 @256x384                 6.22 ms    24.9 TF/s
    dec dilated 128->128 @32x48        5.27 ms | subpel  5.17 ms
    dec dilated 128->128 @64x96        4.22 ms | subpel 24.24 ms
    dec dilated 128->128 @128x192      8.45 ms | subpel 10.36 ms
    dec dilated 128->3   @256x384     13.34 ms | subpel  6.65 ms
    hyp dilated 128->192 @8x12         3.75 ms | subpel  2.82 ms
    hyp dilated 192->288 @16x24        4.75 ms | subpel  4.17 ms

Conclusions: (1) the model's per-shape auto-lowering choices (ops/conv.py
`_deconv_lowering_auto`) are all confirmed optimal; (2) isolated sub-5 ms
programs sit on a ~3 ms tunnel dispatch floor, so per-layer TF/s for the
small/hyper layers understates the fused-program reality (full fused eval
fwd is 37.1 ms for all of the above plus entropy math); (3) the two real
MFU sinks are the thin-channel boundary layers (conv1 3->M, final deconv
M->3) — a space-to-depth fold for conv1 was A/B'd and LOST
(tools/ab_s2d_conv.py), so these stay on XLA's native lowering.

Run detached: nohup env PYTHONPATH=.:/root/.axon_site python -u \
    tools/profile_layers.py > /tmp/profile_layers.log 2>&1 &
"""

import os
import time

import jax
import jax.numpy as jnp

M = int(os.environ.get("NIC_PROFILE_M", "128"))  # model width knob
DTYPE = jnp.bfloat16


def timeit(fn, *args, iters=10, label="", flops=0.0):
    scalar_fn = jax.jit(lambda *a: jnp.sum(jax.tree.leaves(fn(*a))[0]))
    _ = float(scalar_fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        scalar_fn(*args)
    _ = float(scalar_fn(*args))
    dt = (time.perf_counter() - t0) / iters
    eff = flops / dt / 1e12 if flops else 0.0
    print(f"{label:46s} {dt*1000:8.2f} ms   {eff:6.1f} TF/s", flush=True)
    return dt


def main():
    from neural_image_compression_tpu.ops.conv import (
        conv2d, deconv2d, deconv2d_subpel,
    )
    from neural_image_compression_tpu.ops.gdn import GDN

    batch = int(os.environ.get("NIC_PROFILE_BATCH", "48"))
    key = jax.random.PRNGKey(0)

    # Encoder chain: conv5x5 s2 3->M then M->M at falling resolutions.
    shapes = [(512, 768, 3, M), (256, 384, M, M), (128, 192, M, M),
              (64, 96, M, M)]
    for h, w, cin, cout in shapes:
        w_k = jax.random.normal(key, (5, 5, cin, cout), DTYPE) * 0.03
        xin = jax.random.uniform(key, (batch, h, w, cin), DTYPE)
        fl = batch * (h // 2) * (w // 2) * cin * cout * 25 * 2.0
        timeit(lambda a, ww: conv2d(a, ww, stride=2, padding=2), xin, w_k,
               label=f"enc conv5x5 s2 {cin}->{cout} @{h}x{w}", flops=fl)

    # GDN at the largest grid it sees (after conv1).
    gdn = GDN(M, dtype=DTYPE)
    xg = jax.random.uniform(key, (batch, 256, 384, M), DTYPE)
    gv = gdn.init(key, xg)
    timeit(lambda v, a: gdn.apply(v, a), gv, xg,
           label=f"GDN M={M} @256x384",
           flops=batch * 256 * 384 * M * M * 2.0)

    # Decoder chain: deconv5x5 s2, both lowerings per layer.
    dshapes = [(32, 48, M, M), (64, 96, M, M), (128, 192, M, M),
               (256, 384, M, 3)]
    for h, w, cin, cout in dshapes:
        w_k = jax.random.normal(key, (5, 5, cin, cout), DTYPE) * 0.03
        xin = jax.random.uniform(key, (batch, h, w, cin), DTYPE)
        fl = batch * h * w * cin * cout * 25 * 2.0
        timeit(lambda a, ww: deconv2d(a, ww, stride=2, padding=2,
                                      output_padding=1), xin, w_k,
               label=f"dec dilated {cin}->{cout} @{h}x{w}", flops=fl)
        timeit(lambda a, ww: deconv2d_subpel(a, ww, padding=2,
                                             output_padding=1), xin, w_k,
               label=f"dec subpel  {cin}->{cout} @{h}x{w}", flops=fl)

    # Hyper decoder deconvs (z grid 8x12 for Kodak).
    for cin, cout, hh, ww_ in [(M, M * 3 // 2, 8, 12),
                               (M * 3 // 2, 2 * M, 16, 24)]:
        w_k = jax.random.normal(key, (5, 5, cin, cout), DTYPE) * 0.03
        xin = jax.random.uniform(key, (batch, hh, ww_, cin), DTYPE)
        fl = batch * hh * ww_ * cin * cout * 25 * 2.0
        timeit(lambda a, ww: deconv2d(a, ww, stride=2, padding=2,
                                      output_padding=1), xin, w_k,
               label=f"hyp dilated {cin}->{cout} @{hh}x{ww_}", flops=fl)
        timeit(lambda a, ww: deconv2d_subpel(a, ww, padding=2,
                                             output_padding=1), xin, w_k,
               label=f"hyp subpel  {cin}->{cout} @{hh}x{ww_}", flops=fl)


if __name__ == "__main__":
    main()
