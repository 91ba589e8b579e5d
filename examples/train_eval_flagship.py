"""End-to-end driver mirroring the reference's Main.ipynb flow (cells 0-11):

  1. preprocess raw images into 256^2 training patches (cell 2)
  2. build train (batch 16) and Kodak-style val (batch 1) loaders (cell 3)
  3. train JointAutoregressiveHierarchical(latent_channels=128, K=3) with
     Adam lr=1e-4, lambda=0.005 for max_steps, with checkpoint support —
     run again with --resume to continue a run, extending max_steps the way
     the notebook's two-stage 10k -> 100k flow does (cells 5-6)
  4. evaluate on the val set, emit plots + the eval_results txt artifact with
     caption "GM-Capacity128_K3" (cells 8-11)

Usage:
  python examples/train_eval_flagship.py --raw_dir data/coco_val2017 \
      --work_dir runs/flagship --max_steps 10000 [--resume]
"""

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw_dir", required=True, help="folder of raw images")
    ap.add_argument("--kodak_dir", default=None, help="eval set (default: raw)")
    ap.add_argument("--work_dir", default="runs/flagship")
    ap.add_argument("--max_steps", type=int, default=10000)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--latent_channels", type=int, default=128)
    ap.add_argument("--K", type=int, default=3)
    ap.add_argument("--lambda_rd", type=float, default=0.005)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--scalar_interval", type=int, default=1)
    args = ap.parse_args()

    import neural_image_compression_tpu as nic

    # 1. preprocess (skipped if already done)
    patches_dir = os.path.join(args.work_dir, "patches")
    if not os.path.isdir(patches_dir) or not os.listdir(patches_dir):
        n = nic.data.preprocess_images(args.raw_dir, patches_dir,
                                       target_size=256, min_factor=0.8)
        print(f"preprocessed {n} patches -> {patches_dir}")

    # 2. loaders
    train_loader = nic.data.BatchLoader(
        nic.data.ImageFolderDataset(patches_dir),
        batch_size=args.batch_size, shuffle=True)
    eval_dir = args.kodak_dir or patches_dir
    val_loader = nic.data.BatchLoader(
        nic.data.ImageFolderDataset(eval_dir), batch_size=1)

    # 3. train (resume extends max_steps, Trainer.py:70 semantics)
    model = nic.models.JointAutoregressiveHierarchical(
        latent_channels=args.latent_channels, K=args.K)
    trainer = nic.train.Trainer(
        model, train_loader, val_loader=val_loader,
        lambda_val=args.lambda_rd, learning_rate=1e-4,
        max_steps=args.max_steps, resume=args.resume,
        scalar_interval=args.scalar_interval,
        log_dir=os.path.join(args.work_dir, "tb"),
        checkpoint_path=os.path.join(args.work_dir, "checkpoint"))
    params = trainer.train()

    # 4. evaluate + artifacts
    evaluator = nic.evaluation.CompressionEvaluator(
        model, params, val_loader, args.lambda_rd,
        save_dir=os.path.join(args.work_dir, "eval_results"))
    metrics, imgs, recons = evaluator.evaluate()
    evaluator.plot_samples(imgs, recons, n=min(3, len(imgs)), seed=0)
    evaluator.plot_high_entropy_channel(imgs, seed=0)
    evaluator.save_results(metrics, nb_steps=trainer.step,
                           caption=f"GM-Capacity{args.latent_channels}_K{args.K}")


if __name__ == "__main__":
    main()
