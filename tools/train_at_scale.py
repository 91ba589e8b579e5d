"""At-scale harness validation on the real chip: flagship config through the
REAL Trainer (data pipeline -> jitted step -> schedulers -> checkpointing ->
validation -> evaluator artifact), on a synthetic dataset materialized to
disk (no real datasets in this air-gapped box).

Stage 1 (default): train N steps from scratch.
Stage 2 (--resume): continue +N steps from the checkpoint, proving the
resume-extends-max_steps semantics at scale (Trainer.py:70 parity).
"""

import argparse
import os

import numpy as np


def make_synthetic_dataset(root: str, n_train: int = 120, n_val: int = 3):
    from PIL import Image

    rng = np.random.RandomState(0)

    def synth(h, w, key):
        r = np.random.RandomState(key)
        base = r.rand(8, 8, 3)
        img = np.asarray(Image.fromarray(
            (base * 255).astype(np.uint8)).resize((w, h), Image.BICUBIC),
            np.float32) / 255.0
        mid = r.rand(h // 8, w // 8, 3)
        mid = np.asarray(Image.fromarray(
            (mid * 255).astype(np.uint8)).resize((w, h), Image.BILINEAR),
            np.float32) / 255.0
        out = np.clip(0.55 * img + 0.4 * mid + 0.05 * r.randn(h, w, 3), 0, 1)
        return (out * 255).astype(np.uint8)

    tr = os.path.join(root, "train")
    va = os.path.join(root, "val")
    os.makedirs(tr, exist_ok=True)
    os.makedirs(va, exist_ok=True)
    if len(os.listdir(tr)) >= n_train:
        return tr, va
    from PIL import Image as I

    for i in range(n_train):
        I.fromarray(synth(256, 256, i)).save(os.path.join(tr, f"p{i:04d}.png"))
    for i in range(n_val):
        I.fromarray(synth(512, 768, 10_000 + i)).save(os.path.join(va, f"v{i}.png"))
    return tr, va


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work_dir", default="/tmp/nic_scale")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--batch_size", type=int, default=16)
    args = ap.parse_args()

    import neural_image_compression_tpu as nic

    tr_dir, va_dir = make_synthetic_dataset(os.path.join(args.work_dir, "data"))
    train_loader = nic.data.BatchLoader(
        nic.data.ImageFolderDataset(tr_dir, dtype=np.uint8, cache=True),
        batch_size=args.batch_size, shuffle=True)
    val_loader = nic.data.BatchLoader(nic.data.ImageFolderDataset(va_dir),
                                      batch_size=1)

    model = nic.models.JointAutoregressiveHierarchical(latent_channels=128, K=3)
    trainer = nic.train.Trainer(
        model, train_loader, val_loader=val_loader, lambda_val=0.005,
        learning_rate=1e-4, scheduler="cosine", max_steps=args.steps,
        resume=args.resume, scalar_interval=25,
        val_interval=1000, log_interval=1000, img_interval=args.steps,
        checkpoint_interval=1000,
        log_dir=os.path.join(args.work_dir, "tb"),
        checkpoint_path=os.path.join(args.work_dir, "ckpt"))

    import time

    t0 = time.perf_counter()
    params = trainer.train()
    dt = time.perf_counter() - t0
    steps_done = trainer.step - (trainer.max_steps - args.steps)
    print(f"trained {steps_done} steps in {dt:.1f}s "
          f"({steps_done/dt:.2f} steps/s, "
          f"{steps_done*args.batch_size/dt:.1f} img/s)", flush=True)

    ev = nic.evaluation.CompressionEvaluator(
        model, params, val_loader, 0.005,
        save_dir=os.path.join(args.work_dir, "eval_results"))
    metrics, imgs, recons = ev.evaluate()
    ev.save_results(metrics, nb_steps=trainer.step, caption="GM-Capacity128_K3-scale")


if __name__ == "__main__":
    main()
