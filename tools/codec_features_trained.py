"""Validate the newer codec features on TRAINED flagship weights (from
tools/train_at_scale.py): N-way interleaved rANS rate overhead + exactness,
and arbitrary-size (pad-code-crop) round-trip.
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work_dir", default="/tmp/nic_scale")
    args = ap.parse_args()

    import neural_image_compression_tpu as nic

    model = nic.models.JointAutoregressiveHierarchical(latent_channels=128, K=3)
    params = nic.utils.restore_raw(f"{args.work_dir}/ckpt")["params"]
    variables = {"params": params}
    codec = nic.coding.JointARCodec(model, variables)

    img = nic.data.load_image(f"{args.work_dir}/data/val/v0.png")[None]
    h, w = img.shape[1:3]
    print("image:", img.shape, flush=True)

    base = codec.compress(img)  # cold (compiles)
    y_ref, z_ref = codec.decode_latents(base)
    x_hat = codec.decompress(base)
    t0 = time.perf_counter(); base = codec.compress(img); t1 = time.perf_counter()
    x_hat = codec.decompress(base); t2 = time.perf_counter()
    mse = float(np.mean((x_hat - img) ** 2))
    print(f"single stream: {len(base)} bytes = {len(base)*8/(h*w):.4f} bpp, "
          f"PSNR {10*np.log10(1.0/mse):.2f} dB; WARM enc {t1-t0:.2f}s "
          f"dec {t2-t1:.2f}s", flush=True)

    for N in (4, 8):
        t0 = time.perf_counter()
        data = codec.compress(img, n_streams=N)
        t1 = time.perf_counter()
        y_dec, z_dec = codec.decode_latents(data)
        t2 = time.perf_counter()
        exact = (np.array_equal(y_dec, y_ref) and np.array_equal(z_dec, z_ref))
        print(f"n_streams={N}: +{len(data)-len(base)} bytes "
              f"({(len(data)/len(base)-1)*100:+.3f}%), latents exact: {exact}, "
              f"enc {t1-t0:.2f}s dec {t2-t1:.2f}s", flush=True)

    # odd size: crop the val image away from multiples of 64
    odd = np.ascontiguousarray(img[:, : h - 12, : w - 28])
    oh, ow = odd.shape[1:3]
    data = codec.compress(odd, n_streams=8)
    x_hat = codec.decompress(data)
    assert x_hat.shape == (1, oh, ow, 3), x_hat.shape
    mse = float(np.mean((x_hat - odd) ** 2))
    print(f"odd size {oh}x{ow}: {len(data)*8/(oh*ow):.4f} bpp, "
          f"PSNR {10*np.log10(1.0/mse):.2f} dB, shape ok", flush=True)


if __name__ == "__main__":
    main()
