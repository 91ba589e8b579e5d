"""Multi-λ RD sweep on the real chip (the DP-over-ICI sweep use case,
SURVEY §7.2-7): three λ values, short flagship-architecture trainings on the
synthetic dataset, RD curve out."""

import os

import numpy as np


def main():
    import neural_image_compression_tpu as nic
    from tools.train_at_scale import make_synthetic_dataset

    tr_dir, va_dir = make_synthetic_dataset("/tmp/nic_scale/data")
    train_loader = nic.data.BatchLoader(
        nic.data.ImageFolderDataset(tr_dir, dtype=np.uint8),
        batch_size=16, shuffle=True)
    val_loader = nic.data.BatchLoader(nic.data.ImageFolderDataset(va_dir),
                                      batch_size=1)

    points = nic.train.lambda_sweep(
        lambda: nic.models.JointAutoregressiveHierarchical(latent_channels=64, K=3),
        train_loader, val_loader, lambdas=[0.001, 0.005, 0.02],
        max_steps=400, learning_rate=1e-4, out_dir="/tmp/nic_sweep")
    for p in points:
        print(f"lambda={p['lambda']:g}: bpp={p['bpp']:.4f} "
              f"psnr={p['psnr']:.2f} msssim={p['msssim']:.4f}", flush=True)
    nic.train.plot_rd_curve(points, "/tmp/nic_sweep/rd_curve.png")
    print("RD curve -> /tmp/nic_sweep/rd_curve.png", flush=True)


if __name__ == "__main__":
    main()
