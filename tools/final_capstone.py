"""Final capstone on the 25k-step on-device-trained flagship: Kodak-size
eval metrics + real-codec round trip with steady-state (second-call) timing."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import neural_image_compression_tpu as nic

    model = nic.models.JointAutoregressiveHierarchical(latent_channels=128, K=3)
    import os

    ckpt = os.environ.get("CAPSTONE_CKPT", "/tmp/nic_long/ckpt")
    params = nic.utils.restore_raw(ckpt)["params"]
    variables = {"params": params}

    # Kodak-shaped synthetic eval image from the same generator family
    from tools.train_at_scale import make_synthetic_dataset

    tr, va = make_synthetic_dataset("/tmp/nic_scale/data")
    img = nic.data.load_image(f"{va}/v1.png")[None]

    out = jax.jit(lambda v, x: model.apply(v, x, training=False))(
        variables, jnp.asarray(img))
    m = nic.train.rd_loss(out, jnp.asarray(img), 0.005)
    met = nic.evaluation.compute_metrics(jnp.asarray(img),
                                         jnp.clip(out["x_hat"], 0, 1))
    print(f"eval: bpp={float(m['bpp_total']):.4f} "
          f"psnr={float(met['PSNR(RGB)']):.2f} "
          f"msssim={float(met['MS-SSIM(RGB)']):.4f}", flush=True)

    codec = nic.coding.JointARCodec(model, variables)
    # first call includes jit compiles; second call is steady state
    for trial in ("cold", "warm"):
        t0 = time.perf_counter()
        data = codec.compress(img)
        t1 = time.perf_counter()
        x_hat = codec.decompress(data)
        t2 = time.perf_counter()
        h, w = img.shape[1:3]
        print(f"{trial}: {len(data)} bytes ({len(data)*8/(h*w):.4f} bpp), "
              f"enc {t1-t0:.2f}s dec {t2-t1:.2f}s, "
              f"exact={np.allclose(x_hat, np.clip(np.asarray(out['x_hat']),0,1), atol=1e-5)}",
              flush=True)


if __name__ == "__main__":
    main()
