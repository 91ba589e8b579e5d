"""Multi-λ rate-distortion sweeps (SURVEY §7.2-7).

The reference trains one λ per notebook run. Here a sweep is a first-class
loop: train (or fine-tune) one model per λ, evaluate each on the eval set,
and emit the RD curve. Each run reuses the Trainer (so DP-over-mesh applies
per run when a mesh is passed).
"""

import json
import os
from typing import Callable, Dict, List, Optional, Sequence


def lambda_sweep(model_factory: Callable[[], object], train_loader, val_loader,
                 lambdas: Sequence[float], max_steps: int,
                 learning_rate: float = 1e-4, scheduler: Optional[str] = None,
                 out_dir: str = "./sweep", mesh=None, seed: int = 0,
                 eval_loader=None) -> List[Dict[str, float]]:
    """Train one model per λ and evaluate; returns RD points sorted by bpp.

    model_factory: returns a fresh model instance per λ.
    eval_loader: defaults to val_loader.
    """
    from neural_image_compression_tpu.evaluation import CompressionEvaluator
    from neural_image_compression_tpu.train.trainer import Trainer

    os.makedirs(out_dir, exist_ok=True)
    eval_loader = eval_loader or val_loader
    points = []
    for lam in lambdas:
        tag = f"lambda_{lam:g}"
        model = model_factory()
        trainer = Trainer(model, train_loader, val_loader=val_loader,
                          lambda_val=lam, learning_rate=learning_rate,
                          scheduler=scheduler, max_steps=max_steps,
                          log_dir=os.path.join(out_dir, "runs", tag),
                          checkpoint_path=os.path.join(out_dir, "ckpt", tag),
                          seed=seed, mesh=mesh)
        params = trainer.train()
        ev = CompressionEvaluator(model, params, eval_loader, lam,
                                  save_dir=os.path.join(out_dir, "eval", tag))
        metrics, _, _ = ev.evaluate()
        point = {"lambda": lam, "bpp": metrics["BPP"],
                 "psnr": metrics["PSNR(RGB)"],
                 "msssim": metrics["MS-SSIM(RGB)"]}
        points.append(point)

    points.sort(key=lambda p: p["bpp"])
    with open(os.path.join(out_dir, "rd_curve.json"), "w") as f:
        json.dump(points, f, indent=1)
    return points


def plot_rd_curve(points: List[Dict[str, float]], save_path: str,
                  metric: str = "psnr"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    bpp = [p["bpp"] for p in points]
    val = [p[metric] for p in points]
    fig = plt.figure(figsize=(6, 4))
    plt.plot(bpp, val, "o-")
    plt.xlabel("bpp")
    plt.ylabel(metric.upper())
    plt.title("Rate-distortion curve")
    plt.grid(True, linestyle="--", alpha=0.5)
    plt.tight_layout()
    fig.savefig(save_path, dpi=100)
    plt.close(fig)
    return save_path
