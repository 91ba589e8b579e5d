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


def gained_rd_curve(model, params, eval_loader,
                    levels: Optional[Sequence[float]] = None,
                    out_dir: Optional[str] = None) -> List[Dict[str, float]]:
    """RD curve from ONE trained variable-rate model (models.GainedJointAR).

    Folds the gain vectors at each level (defaults: the model's integer
    ladder; pass fractional levels for interpolated rate points) and runs
    the standard evaluator on the resulting fixed-rate model. Emits the same
    point/curve shape as lambda_sweep, so evaluation.bd_rate and
    plot_rd_curve consume it directly — the whole curve costs N evals and
    zero retraining.
    """
    from neural_image_compression_tpu.evaluation import CompressionEvaluator
    from neural_image_compression_tpu.models.gained import fold_gains, folded_model

    if levels is None:
        levels = list(range(len(model.levels)))
    fm = folded_model(model)
    points = []
    for level in levels:
        ev = CompressionEvaluator(fm, fold_gains(params, level), eval_loader,
                                  float(interp_lambda(model.levels, level)),
                                  save_dir=None)
        metrics, _, _ = ev.evaluate()
        points.append({"lambda": float(interp_lambda(model.levels, level)),
                       "level": float(level), "bpp": metrics["BPP"],
                       "psnr": metrics["PSNR(RGB)"],
                       "msssim": metrics["MS-SSIM(RGB)"]})
    points.sort(key=lambda p: p["bpp"])
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "rd_curve.json"), "w") as f:
            json.dump(points, f, indent=1)
    return points


def interp_lambda(levels: Sequence[float], level) -> float:
    """The lambda a (possibly fractional) gain level corresponds to —
    geometric interpolation, matching models.gained.interp_gain."""
    import math

    n = len(levels)
    lv = min(max(float(level), 0.0), n - 1)
    lo = int(lv)
    hi = min(lo + 1, n - 1)
    t = lv - lo
    return math.exp((1 - t) * math.log(levels[lo]) + t * math.log(levels[hi]))


def vmapped_lambda_sweep(model, lambdas: Sequence[float], train_iter,
                         steps: int, learning_rate: float = 1e-4,
                         seed: int = 0, rd_loss=None, log_every: int = 0,
                         log_fn=print, clip_grad_norm=None,
                         augment: bool = False):
    """Train one model PER λ simultaneously with a vmapped train step.

    TPU-idiomatic sweep: instead of L sequential runs, the step is vmapped
    over a leading λ axis of stacked parameters — the chip sees one big
    batched program (L small matmuls fuse into fatter ones), so the whole RD
    curve trains in roughly the time of one run.

    model: a flax module; train_iter: yields (B, H, W, 3) batches shared by
    all replicas. Returns (params_per_lambda: list of pytrees, losses:
    (L,) final losses). log_every > 0 prints per-lambda losses every that
    many steps (one host sync per report).

    augment=True applies per-step on-device dihedral augmentation
    (independent horizontal flip, vertical flip, and — for square patches
    — transpose) to the shared batch before the replicas consume it. Zero
    host cost (three jnp.where selects fused into the step program) and
    8× the effective pose diversity of a fixed patch pool — the measured
    mitigation target for the round-5 100k-step overfit finding
    (eval_results/rd_converged_100k.json: 780 epochs over 2048 fixed
    patches overfits the high-capacity context families). All λ replicas
    see the SAME augmented batch (the flip bits come from the shared step
    key), keeping the sweep's equal-data contract.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from neural_image_compression_tpu.train.loss import rd_loss as default_rd
    rd_loss = rd_loss or default_rd

    lambdas_arr = jnp.asarray(list(lambdas), jnp.float32)
    L = lambdas_arr.shape[0]
    batch0 = jnp.asarray(next(iter(train_iter)))
    if batch0.dtype == jnp.uint8:
        batch0 = batch0.astype(jnp.float32) / 255.0

    keys = jax.random.split(jax.random.PRNGKey(seed), L)
    init_one = lambda k: model.init({"params": k, "noise": k}, batch0,  # noqa: E731
                                    training=True)["params"]
    params = jax.jit(jax.vmap(init_one))(keys)  # stacked along axis 0

    # clip_grad_norm: per-replica global-norm clipping. High-lambda replicas
    # can spike late in training (a diverged replica poisons only itself —
    # the vmap keeps states independent — but wastes its lane).
    if clip_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_grad_norm),
                         optax.adam(learning_rate))
    else:
        tx = optax.adam(learning_rate)
    opt_state = jax.jit(jax.vmap(tx.init))(params)

    def one_step(p, o, lam, batch, rng):
        def lf(p):
            out = model.apply({"params": p}, batch, training=True,
                              rngs={"noise": rng})
            return rd_loss(out, batch, lam)["loss"]

        loss, g = jax.value_and_grad(lf)(p)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), o, loss

    from functools import partial

    def _augment(batch, key):
        # dihedral-group augmentation as three fused selects; shapes are
        # static (transpose only when H == W), so XLA compiles one program
        bh, bv, bt = jax.random.bernoulli(key, 0.5, (3,))
        batch = jnp.where(bh, batch[:, :, ::-1, :], batch)
        batch = jnp.where(bv, batch[:, ::-1, :, :], batch)
        if batch.shape[1] == batch.shape[2]:
            batch = jnp.where(bt, jnp.swapaxes(batch, 1, 2), batch)
        return batch

    @partial(jax.jit, donate_argnums=(0, 1))
    def sweep_step(params, opt_state, batch, rngs, aug_key):
        if batch.dtype == jnp.uint8:
            batch = batch.astype(jnp.float32) / 255.0
        if augment:
            batch = _augment(batch, aug_key)
        return jax.vmap(one_step, in_axes=(0, 0, 0, None, 0))(
            params, opt_state, lambdas_arr, batch, rngs)

    rng = jax.random.PRNGKey(seed + 1)
    it = iter(train_iter)
    losses = None
    for i in range(steps):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(train_iter)
            batch = next(it)
        rng, sub = jax.random.split(rng)
        step_rngs = jax.random.split(sub, L)
        # aug key drawn only in augment mode so augment=False reproduces
        # the historical rng stream (cached sweep pickles) exactly
        if augment:
            rng, aug_key = jax.random.split(rng)
        else:
            aug_key = sub
        params, opt_state, losses = sweep_step(params, opt_state,
                                               jnp.asarray(batch), step_rngs,
                                               aug_key)
        if log_every and (i % log_every == 0 or i == steps - 1):
            log_fn(f"  [sweep] step {i} losses "
                   f"{[round(float(v), 4) for v in losses]}")

    per_lambda = [jax.tree.map(lambda a, i=i: a[i], params) for i in range(L)]
    return per_lambda, losses


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
