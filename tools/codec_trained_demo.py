"""Full-system capstone: real bitstream round-trip on the TRAINED flagship
checkpoint (from tools/train_at_scale.py) at Kodak size.

Verifies on trained weights: measured bitstream bpp vs analytic bpp, exact
latent reconstruction through the wavefront AR decoder, and PSNR of the
decoded image; reports encode/decode wall time split (TPU transforms vs host
entropy coding)."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import neural_image_compression_tpu as nic

    model = nic.models.JointAutoregressiveHierarchical(latent_channels=128, K=3)
    params = nic.utils.restore_raw("/tmp/nic_scale/ckpt")["params"]
    variables = {"params": params}

    img = nic.data.load_image("/tmp/nic_scale/data/val/v0.png")[None]
    print("image:", img.shape, flush=True)

    codec = nic.coding.JointARCodec(model, variables)
    t0 = time.perf_counter()
    data = codec.compress(img)
    t1 = time.perf_counter()
    x_hat = codec.decompress(data)
    t2 = time.perf_counter()

    out = model.apply(variables, jnp.asarray(img), training=False)
    m = nic.train.rd_loss(out, jnp.asarray(img), 0.005)
    h, w = img.shape[1:3]
    real_bpp = len(data) * 8 / (h * w)
    ref = np.clip(np.asarray(out["x_hat"]), 0, 1)
    mse = float(np.mean((x_hat - img) ** 2))
    psnr = 10 * np.log10(1.0 / mse)
    print(f"bitstream: {len(data)} bytes = {real_bpp:.4f} bpp "
          f"(analytic {float(m['bpp_total']):.4f}, "
          f"overhead {real_bpp/float(m['bpp_total'])-1:+.2%})", flush=True)
    print(f"decode == eval forward: {np.allclose(x_hat, ref, atol=1e-5)}", flush=True)
    print(f"PSNR(decoded vs original): {psnr:.2f} dB", flush=True)
    print(f"encode {t1-t0:.2f}s, decode {t2-t1:.2f}s", flush=True)


if __name__ == "__main__":
    main()
