"""Retrain ONE (family, λ) curve replica and merge it into the curves
artifact (round-5).

The vmapped sweep trains all λ replicas of a family in one program; when a
single high-λ replica lands on a degenerate point (the `_curve_health`
guard fires — e.g. channel_cb λ=0.08 this round: 0.228 bpp for LESS PSNR
than its own λ=0.02 point), retraining the whole family costs ~30 min on
the chip while retraining the one replica with a fresh seed costs ~6 min.
This tool does the latter: train a 1-λ sweep (fresh seed), evaluate the
point with the exact `_eval_point` the curves tool uses, replace that λ's
entry in eval_results/<NIC_CURVES_OUT>, and recompute health + BD-rate.

The retrained params are cached in <STATE>/<family>_lam<λ>_seed<seed>.pkl
(the family's main 4-replica pickle is left untouched — tools/ab_refine.py
indexes it by the full λ ladder).

Run detached on the chip (one TPU process at a time — CLAUDE.md):
  PYTHONPATH=.:/root/.axon_site NIC_RETRAIN_FAMILY=channel_cb \
  NIC_RETRAIN_LAMBDA=0.08 NIC_RETRAIN_SEED=1 \
  nohup python -u tools/retrain_point.py &
"""

import json
import os
import pickle
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FAMILY = os.environ.get("NIC_RETRAIN_FAMILY", "channel_cb")
LAM = float(os.environ.get("NIC_RETRAIN_LAMBDA", "0.08"))
SEED = int(os.environ.get("NIC_RETRAIN_SEED", "1"))


def main():
    import tools.rd_curves_natural as rdc
    from neural_image_compression_tpu.coding.codec import (
        ChannelCheckerboardCodec, CheckerboardCodec, FactorizedPriorCodec,
        JointARCodec, MeanScaleHyperpriorCodec,
    )
    from neural_image_compression_tpu.evaluation.bdrate import bd_rate
    from neural_image_compression_tpu.models import (
        ChannelCheckerboardHierarchical, CheckerboardHierarchical,
        FactorizedPrior, JointAutoregressiveHierarchical, MeanScaleHyperprior,
    )
    from neural_image_compression_tpu.train.sweep import vmapped_lambda_sweep

    M, K = rdc.M, rdc.K
    registry = {
        "joint_ar": (lambda: JointAutoregressiveHierarchical(
            latent_channels=M, K=K, dtype=jnp.bfloat16), JointARCodec),
        "channel_cb": (lambda: ChannelCheckerboardHierarchical(
            latent_channels=M, K=K, dtype=jnp.bfloat16),
            ChannelCheckerboardCodec),
        "checkerboard": (lambda: CheckerboardHierarchical(
            latent_channels=M, K=K, dtype=jnp.bfloat16), CheckerboardCodec),
        "hyperprior": (lambda: MeanScaleHyperprior(
            latent_channels=M, K=K, dtype=jnp.bfloat16),
            MeanScaleHyperpriorCodec),
        "factorized": (lambda: FactorizedPrior(
            latent_channels=M, dtype=jnp.bfloat16), FactorizedPriorCodec),
    }
    make_model, Codec = registry[FAMILY]
    model = make_model()
    pool, vals = rdc._data()

    pk = os.path.join(rdc.STATE, f"{FAMILY}_lam{LAM:g}_seed{SEED}.pkl")
    if os.path.exists(pk + ".ok"):
        print(f"[{FAMILY}@{LAM}] cached retrain params", flush=True)
        with open(pk, "rb") as f:
            params = jax.tree.map(jnp.asarray, pickle.load(f))
    else:
        print(f"[{FAMILY}@{LAM}] 1-λ retrain, seed {SEED}, "
              f"{rdc.STEPS} steps ...", flush=True)
        t0 = time.time()
        per_lambda, losses = vmapped_lambda_sweep(
            model, (LAM,), rdc.PoolIter(pool), steps=rdc.STEPS,
            log_every=10_000, clip_grad_norm=rdc.CLIP, seed=SEED,
            augment=rdc.AUGMENT)
        params = per_lambda[0]
        print(f"[{FAMILY}@{LAM}] done in {(time.time() - t0) / 60:.1f} min, "
              f"final loss {float(losses[0]):.4f}", flush=True)
        with open(pk, "wb") as f:
            pickle.dump(jax.device_get(params), f)
        open(pk + ".ok", "w").write("ok")

    res = rdc._eval_point(model, params, Codec, vals, LAM)
    res["lambda"] = LAM
    res["retrained_seed"] = SEED
    print(f"[{FAMILY}@{LAM}] {json.dumps(res)}", flush=True)

    art = os.path.join(REPO, "eval_results", rdc.OUT)
    with open(art) as f:
        prior = json.load(f)
    curves, health = prior["curves"], prior.get("health", {})
    pts = [p for p in curves.get(FAMILY, []) if p["lambda"] != LAM] + [res]
    pts.sort(key=lambda p: p["lambda"])
    curves[FAMILY] = pts
    warns = rdc._curve_health(pts)
    health[FAMILY] = warns
    for w in warns:
        print(f"[{FAMILY}] HEALTH WARNING: {w}", flush=True)
    rdc._write_artifact(curves, bd_rate, health)
    print(f"-> merged into {art}")


if __name__ == "__main__":
    main()
