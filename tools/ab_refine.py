"""Latent-refinement RD A/B on converged flagship-size models.

Loads the per-lambda trained parameters cached by tools/rd_curves_natural.py
(/tmp/nic_rd_curves_natural/<family>.pkl — M=128 K=3, 30k-step vmapped
sweep on the natural-ish corpus), evaluates the held-out 768x512 images
with and without encode-time latent refinement (coding/refine.py), and
reports analytic + MEASURED-bitstream rate and PSNR for both arms plus
refinement wall time.

The refined stream is produced by codec.compress_latents — same decoder,
same entropy coding, so measured bpp deltas are real end-to-end numbers.

Run detached on the chip (one TPU process at a time — CLAUDE.md):
  PYTHONPATH=.:/root/.axon_site nohup python -u tools/ab_refine.py &
Env: NIC_REFINE_FAMILIES (default joint_ar,hyperprior,channel_cb),
     NIC_REFINE_LAMBDAS (default 0.005,0.02), NIC_REFINE_STEPS (default
     150), NIC_REFINE_LR (default 1e-3 — 1e-2 diverges on converged
     models), NIC_REFINE_N (default 8: refine
     the first N of the held-out val images — 150 Adam steps per image
     make the full 24-image set a multi-hour run; N is recorded in the
     artifact).
"""

import json
import os
import pickle
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

M, K = 128, 3
STATE = os.environ.get("NIC_CURVES_STATE", "/tmp/nic_rd_curves_natural")
LAMBDAS = tuple(float(v) for v in os.environ.get(
    "NIC_REFINE_LAMBDAS", "0.005,0.02").split(","))
ALL_LAMBDAS = (0.001, 0.005, 0.02, 0.08)  # rd_curves_natural.py order
STEPS = int(os.environ.get("NIC_REFINE_STEPS", "150"))
LR = float(os.environ.get("NIC_REFINE_LR", "1e-3"))


def main():
    from tools.synth_natural import make_natural_dataset

    from neural_image_compression_tpu.coding.codec import (
        ChannelCheckerboardCodec, CheckerboardCodec, JointARCodec,
        MeanScaleHyperpriorCodec,
    )
    from neural_image_compression_tpu.coding.refine import make_refiner
    from neural_image_compression_tpu.data import ImageFolderDataset
    from neural_image_compression_tpu.models import (
        ChannelCheckerboardHierarchical, CheckerboardHierarchical,
        JointAutoregressiveHierarchical, MeanScaleHyperprior,
    )
    from neural_image_compression_tpu.train.loss import rd_loss

    registry = {
        "joint_ar": (lambda: JointAutoregressiveHierarchical(
            latent_channels=M, K=K, dtype=jnp.bfloat16), JointARCodec),
        "hyperprior": (lambda: MeanScaleHyperprior(
            latent_channels=M, K=K, dtype=jnp.bfloat16),
            MeanScaleHyperpriorCodec),
        "checkerboard": (lambda: CheckerboardHierarchical(
            latent_channels=M, K=K, dtype=jnp.bfloat16), CheckerboardCodec),
        "channel_cb": (lambda: ChannelCheckerboardHierarchical(
            latent_channels=M, K=K, dtype=jnp.bfloat16),
            ChannelCheckerboardCodec),
    }
    fams = os.environ.get("NIC_REFINE_FAMILIES",
                          "joint_ar,hyperprior,channel_cb").split(",")

    _, va_dir = make_natural_dataset("/tmp/nic_natural/data")
    val = ImageFolderDataset(va_dir, cache=True)
    n = int(os.environ.get("NIC_REFINE_N", "8"))
    vals = [np.asarray(val[i])[None] for i in range(min(n, len(val)))]
    h, w = vals[0].shape[1:3]

    results = {"config": {"M": M, "K": K, "refine_steps": STEPS, "lr": LR,
                          "image": f"{w}x{h} synth_natural",
                          "n_images": len(vals)}, "rows": []}
    for fam in fams:
        make_model, Codec = registry[fam]
        pk = os.path.join(STATE, f"{fam}.pkl")
        if not os.path.exists(pk + ".ok"):
            print(f"[{fam}] no cached sweep params at {pk}, skipping",
                  flush=True)
            continue
        with open(pk, "rb") as f:
            per_lambda = [jax.tree.map(jnp.asarray, t)
                          for t in pickle.load(f)]
        model = make_model()
        for lam in LAMBDAS:
            params = per_lambda[ALL_LAMBDAS.index(lam)]
            codec = Codec(model, {"params": params})
            refiner = make_refiner(model, {"params": params}, lam,
                                   steps=STEPS, lr=LR)
            fwd = jax.jit(lambda p, x: model.apply({"params": p}, x,
                                                   training=False))
            rows = []
            for v in vals:
                x = jnp.asarray(v)
                m0 = rd_loss(fwd(params, x), x, lam)
                b0 = codec.compress((v * 255).astype(np.uint8))
                t0 = time.time()
                y_q, z_q, m = refiner(x)
                _ = float(m["post_loss"])  # completion barrier
                dt = time.time() - t0
                b1 = codec.compress_latents(np.asarray(y_q)[0],
                                            np.asarray(z_q)[0], h, w)
                rows.append({
                    "pre_bpp": float(m0["bpp_total"]),
                    "pre_measured": len(b0) * 8 / (h * w),
                    "pre_psnr": float(m0["psnr"]),
                    "post_bpp": float(m["post_bpp_total"]),
                    "post_measured": len(b1) * 8 / (h * w),
                    "post_psnr": float(m["post_psnr"]),
                    "pre_loss": float(m["pre_loss"]),
                    "post_loss": float(m["post_loss"]),
                    "refine_s": dt,
                })
            agg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
            agg.update(family=fam, lam=lam)
            results["rows"].append(agg)
            print(f"[{fam}@{lam}] loss {agg['pre_loss']:.4f} -> "
                  f"{agg['post_loss']:.4f} ({100 * (agg['post_loss'] / agg['pre_loss'] - 1):+.2f}%)  "
                  f"bpp {agg['pre_measured']:.4f} -> {agg['post_measured']:.4f}  "
                  f"psnr {agg['pre_psnr']:.2f} -> {agg['post_psnr']:.2f}  "
                  f"({agg['refine_s']:.1f}s/img)", flush=True)

    out = os.path.join(REPO, "eval_results", "ab_latent_refine.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
