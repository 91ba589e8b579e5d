"""Profile the PORTABLE (integer) AR codec host path at flagship scale.

Builds an M=128 K=3 PortableCard from a random-init flagship model (cached
to /tmp/card_flagship.npz), synthesizes Kodak-size latents with realistic
magnitudes, and times:

  * card.hyper_forward (integer hyper-decoder, numpy)
  * psi_precompute (the big (H*W, hidden) GEMM)
  * native C++ portable AR encode / decode (ar_portable.cc)
  * numpy portable AR encode / decode (optional, --numpy; slow)

CPU-only (no TPU), safe to run alongside nothing else on the 1-vCPU box.
"""

import argparse
import os
import time

import numpy as np


def get_card(path="/tmp/card_flagship.npz", M=128, K=3):
    from neural_image_compression_tpu.coding.portable import PortableCard

    if os.path.exists(path):
        return PortableCard.load(path)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import neural_image_compression_tpu as nic

    model = nic.models.JointAutoregressiveHierarchical(latent_channels=M, K=K)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 64, 64, 3))
    variables = model.init({"params": key, "noise": key}, x, training=True)
    card = PortableCard.build(model, variables)
    card.save(path)
    return card


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=32)
    ap.add_argument("--w", type=int, default=48)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--numpy", action="store_true",
                    help="also time the (slow) numpy reference path")
    args = ap.parse_args()

    card = get_card()
    M, K = card.M, card.K
    h, w = args.h, args.w
    hz, wz = h // 4, w // 4
    rng = np.random.RandomState(0)
    y_q = np.round(rng.randn(h, w, M) * 2.0).astype(np.int32)
    y_q.flat[::997] = rng.randint(-60, 60, y_q.flat[::997].shape)  # outliers
    z_q = np.round(rng.randn(hz, wz, M) * 2.0).astype(np.int32)

    psi_fix = card.hyper_forward(z_q)  # warm (builds the native lib)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        psi_fix = card.hyper_forward(z_q)
    t_hyper = (time.perf_counter() - t0) / args.iters
    print(f"hyper_forward (native)     {t_hyper*1e3:8.1f} ms  "
          f"psi {psi_fix.shape} max|psi|={np.abs(psi_fix).max()}")

    t0 = time.perf_counter()
    for _ in range(args.iters):
        p_acc = card.psi_precompute(psi_fix.reshape(-1, psi_fix.shape[-1]))
    t_pre = (time.perf_counter() - t0) / args.iters
    print(f"psi_precompute (native)    {t_pre*1e3:8.1f} ms  "
          f"p_acc {p_acc.shape}")

    from neural_image_compression_tpu.coding.portable import (
        portable_ar_decode, portable_ar_encode,
    )

    data = portable_ar_encode(card, y_q, psi_fix, native=True)  # warm build
    t0 = time.perf_counter()
    for _ in range(args.iters):
        data = portable_ar_encode(card, y_q, psi_fix, native=True)
    t_enc = (time.perf_counter() - t0) / args.iters
    print(f"native AR encode           {t_enc*1e3:8.1f} ms  "
          f"{len(data)} bytes ({len(data)*8/(16*h*16*w):.4f} bpp)")

    y_dec = portable_ar_decode(card, data, psi_fix, h, w, native=True)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        y_dec = portable_ar_decode(card, data, psi_fix, h, w, native=True)
    t_dec = (time.perf_counter() - t0) / args.iters
    ok = np.array_equal(y_dec.astype(np.int32), y_q)
    print(f"native AR decode           {t_dec*1e3:8.1f} ms  exact={ok}")
    assert ok

    if args.numpy:
        t0 = time.perf_counter()
        data_np = portable_ar_encode(card, y_q, psi_fix, native=False)
        t = time.perf_counter() - t0
        print(f"numpy AR encode            {t*1e3:8.1f} ms  "
              f"identical={data_np == data}")


if __name__ == "__main__":
    main()
