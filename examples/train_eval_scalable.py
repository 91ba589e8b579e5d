"""End-to-end driver for scalable (base + enhancement) coding with vision
distillation — the flow of the reference's LOST `Main-Scalable-Coding.ipynb`
(a missing large blob; see SURVEY.md §0), reconstructed from its in-repo
counterparts: the model (Models.py:208-338), the loss (RateDistortionLoss.py:
52-121), the evaluator (Evaluator.py:245-493), and the backbone surgery
(Extra.py:1-70).

  1. preprocess raw images into 256^2 training patches
  2. build a frozen CSP/YOLO-style vision backbone, split it at a cut layer
     (FirstHalf = the distillation teacher V), and clone the cut layer's
     frozen BatchNorm + SiLU as the distillation activation. With real
     pretrained weights, load them into the same GraphBackbone structure;
     here the backbone is seeded-random, which exercises the identical code
     path (the reference's notebook loaded a YOLO checkpoint).
  3. train ScalableImageCoding with vision_rd_loss: rate(y1) + rate(y2) +
     rate(z) + lambda*(MSE + gamma*||act(F_tilde) - V(x_hat)||^2)
  4. evaluate with VisionCompressionEvaluator (per-layer bpp + artifacts)
  5. demo the layered bitstream: full stream -> x_hat, truncate_base() ->
     base-only stream -> (y1, F_tilde) for the vision task, with measured
     per-layer rates (a capability the reference never had — it published
     analytic rates only)

Usage:
  python examples/train_eval_scalable.py --raw_dir data/coco_val2017 \
      --work_dir runs/scalable --max_steps 10000
"""

import argparse
import functools
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw_dir", required=True, help="folder of raw images")
    ap.add_argument("--kodak_dir", default=None, help="eval set (default: raw)")
    ap.add_argument("--work_dir", default="runs/scalable")
    ap.add_argument("--max_steps", type=int, default=10000)
    ap.add_argument("--resume", action="store_true")
    # Reference scalable config: M=192 total, M1=128 base (Models.py:222-224).
    ap.add_argument("--latent_channels", type=int, default=192)
    ap.add_argument("--base_channels", type=int, default=128)
    ap.add_argument("--K", type=int, default=1)
    ap.add_argument("--lambda_rd", type=float, default=0.01)
    ap.add_argument("--gamma", type=float, default=1.0,
                    help="vision-distillation weight (0 disables the term)")
    ap.add_argument("--cut", type=int, default=3,
                    help="backbone split layer (FirstHalf = layers [0, cut])")
    ap.add_argument("--backbone", default=None,
                    help="saved backbone .npz (models.save_backbone / "
                         "models.yolo_backbone_variables_from_torch); "
                         "default: a seeded-random backbone")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--scalar_interval", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import neural_image_compression_tpu as nic
    from neural_image_compression_tpu.models import (
        build_yolo_backbone, distillation_targets)

    # 1. preprocess (skipped if already done)
    patches_dir = os.path.join(args.work_dir, "patches")
    if not os.path.isdir(patches_dir) or not os.listdir(patches_dir):
        n = nic.data.preprocess_images(args.raw_dir, patches_dir,
                                       target_size=256, min_factor=0.8)
        print(f"preprocessed {n} patches -> {patches_dir}")

    train_loader = nic.data.BatchLoader(
        nic.data.ImageFolderDataset(patches_dir),
        batch_size=args.batch_size, shuffle=True)
    eval_dir = args.kodak_dir or patches_dir
    val_loader = nic.data.BatchLoader(
        nic.data.ImageFolderDataset(eval_dir), batch_size=1)

    # 2. frozen backbone + surgery. LST(y1) lands on an /8 grid with
    # 2*base_channels features (lst_upsampling=(2,1,1,1)); a backbone of
    # width=base_channels//2 puts its P3 stage (layer `cut`=3) at the same
    # (grid, channels), so the distillation residual is well-posed.
    activation = V = None
    if args.gamma > 0:  # gamma=0: skip the teacher entirely (it would cost
        # a full backbone forward per step, weighted by zero)
        if args.backbone:
            from neural_image_compression_tpu.models import load_backbone

            backbone, bvars = load_backbone(args.backbone)
        else:
            if args.base_channels % 2:
                ap.error("--base_channels must be even (backbone width = M1/2)")
            backbone = build_yolo_backbone(width=args.base_channels // 2)
            bvars = jax.jit(backbone.init)(jax.random.PRNGKey(42),
                                           jnp.zeros((1, 256, 256, 3)))
        activation, V = distillation_targets(backbone, bvars, args.cut)
    loss_fn = functools.partial(nic.train.vision_rd_loss, gamma=args.gamma,
                                frozen_activation=activation, V=V)

    # 3. train (resume extends max_steps, Trainer.py:70 semantics)
    model = nic.models.ScalableImageCoding(
        latent_channels=args.latent_channels,
        base_channels=args.base_channels, K=args.K)
    trainer = nic.train.Trainer(
        model, train_loader, val_loader=val_loader, rd_loss=loss_fn,
        lambda_val=args.lambda_rd, learning_rate=1e-4,
        max_steps=args.max_steps, resume=args.resume,
        scalar_interval=args.scalar_interval,
        log_dir=os.path.join(args.work_dir, "tb"),
        checkpoint_path=os.path.join(args.work_dir, "checkpoint"))
    params = trainer.train()

    # 4. evaluate + artifacts (per-layer bpp split the reference reports)
    evaluator = nic.evaluation.VisionCompressionEvaluator(
        model, params, val_loader, args.lambda_rd, gamma=args.gamma,
        save_dir=os.path.join(args.work_dir, "eval_results"))
    metrics, imgs, recons = evaluator.evaluate(
        functools.partial(nic.train.vision_rd_loss,
                          frozen_activation=activation, V=V))
    evaluator.plot_samples(imgs, recons, n=min(3, len(imgs)), seed=0)
    evaluator.plot_high_entropy_channel(imgs, seed=0)
    evaluator.save_results(
        metrics, nb_steps=trainer.step,
        caption=f"Scalable{args.latent_channels}_M1-{args.base_channels}")

    # 5. layered bitstream: encode once, serve two qualities
    codec = nic.coding.ScalableCodec(model, {"params": params})
    x = np.asarray(imgs[0])[None]
    full = codec.compress(x)
    base = codec.truncate_base(full)
    h, w = x.shape[1], x.shape[2]
    y1, f_tilde = codec.decompress_base(base)
    x_hat = codec.decompress(full)
    psnr = 10.0 * np.log10(1.0 / max(float(np.mean((x_hat - x) ** 2)), 1e-12))
    print(f"layered stream: full {nic.coding.bitstream_bpp(full, h, w):.4f} "
          f"bpp -> x_hat PSNR {psnr:.2f} dB; "
          f"base-only {nic.coding.bitstream_bpp(base, h, w):.4f} bpp -> "
          f"F_tilde {tuple(f_tilde.shape)} for the vision head")


if __name__ == "__main__":
    main()
