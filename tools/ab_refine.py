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
     150), NIC_REFINE_LR (default 3e-4 — see the regime note at the
     constant; 1e-2 diverges on any converged model), NIC_REFINE_N
     (default 8: refine
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
# _v2: round-5 checkpoints trained on the 2048-patch corpus (the 160-patch
# regime's checkpoints live in the old un-suffixed dir and are retired).
STATE = os.environ.get("NIC_CURVES_STATE", "/tmp/nic_rd_curves_natural_v2")
LAMBDAS = tuple(float(v) for v in os.environ.get(
    "NIC_REFINE_LAMBDAS", "0.005,0.02").split(","))
ALL_LAMBDAS = (0.001, 0.005, 0.02, 0.08)  # rd_curves_natural.py order
STEPS = int(os.environ.get("NIC_REFINE_STEPS", "150"))
# LR is checkpoint-regime-dependent and must SHRINK as checkpoints sharpen:
# 1e-2 diverges on any converged model (r4 probes); 1e-3 was optimal on the
# r4 overfit-regime checkpoints but RAISES the loss (+5…10%) on the r5
# well-generalized ones, where 3e-4 gives strict wins at both λ (r5
# probes, /tmp/r5/refine_probe.log pattern: bpp −2.7%, psnr +0.2 dB at
# λ=0.02). Probe per checkpoint regime before trusting a default.
LR = float(os.environ.get("NIC_REFINE_LR", "3e-4"))


def _curve_fns(pts):
    """(measured_bpp, psnr) curve -> (psnr_at_bpp, bpp_at_psnr) interpolators.

    Piecewise-linear in (log2 bpp, psnr) — the Bjøntegaard coordinate
    system — over the family's own RD curve, so refinement's loss delta can
    be decomposed into 'gap closed' vs 'moved along the curve' (VERDICT r4
    item 6). Inputs outside the curve's span are clamped (flagged by the
    caller via the returned span)."""
    pts = sorted(pts, key=lambda p: p["measured_bpp"])
    lb = np.log2([p["measured_bpp"] for p in pts])
    ps = np.array([p["psnr"] for p in pts])

    def psnr_at_bpp(b):
        return float(np.interp(np.log2(b), lb, ps))

    def bpp_at_psnr(p):
        return float(2.0 ** np.interp(p, ps, lb))
    return psnr_at_bpp, bpp_at_psnr, (float(ps[0]), float(ps[-1]))


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
                          "n_images": len(vals), "state": STATE}, "rows": []}
    # family RD curves for the bpp-matched decomposition: must be the SAME
    # checkpoints' curves (rd_curves_natural.json regenerated from STATE)
    curves_art = os.path.join(REPO, "eval_results", "rd_curves_natural.json")
    fam_curves = {}
    if os.path.exists(curves_art):
        with open(curves_art) as f:
            fam_curves = json.load(f).get("curves", {})
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
            # λ-consistent decomposition vs the family's OWN curve
            # (VERDICT r4 item 6): positive psnr_delta_at_post_bpp = true
            # amortization-gap recovery (above the curve); bpp_saving_at_
            # equal_psnr_pct < 0 = fewer bits than the curve needs for the
            # post-refine quality.
            if fam in fam_curves and len(fam_curves[fam]) >= 2:
                pab, bap, span = _curve_fns(fam_curves[fam])
                agg["psnr_on_curve_at_post_bpp"] = pab(agg["post_measured"])
                agg["psnr_delta_at_post_bpp"] = (
                    agg["post_psnr"] - agg["psnr_on_curve_at_post_bpp"])
                agg["curve_bpp_at_post_psnr"] = bap(agg["post_psnr"])
                agg["bpp_saving_at_equal_psnr_pct"] = 100 * (
                    agg["post_measured"] / agg["curve_bpp_at_post_psnr"] - 1)
                agg["curve_psnr_span"] = span
                agg["off_curve_extrapolated"] = bool(
                    agg["post_psnr"] < span[0] or agg["post_psnr"] > span[1])
            results["rows"].append(agg)
            print(f"[{fam}@{lam}] loss {agg['pre_loss']:.4f} -> "
                  f"{agg['post_loss']:.4f} ({100 * (agg['post_loss'] / agg['pre_loss'] - 1):+.2f}%)  "
                  f"bpp {agg['pre_measured']:.4f} -> {agg['post_measured']:.4f}  "
                  f"psnr {agg['pre_psnr']:.2f} -> {agg['post_psnr']:.2f}  "
                  f"({agg['refine_s']:.1f}s/img)", flush=True)
            if "psnr_delta_at_post_bpp" in agg:
                print(f"[{fam}@{lam}]   vs own curve: "
                      f"{agg['psnr_delta_at_post_bpp']:+.3f} dB at equal "
                      f"bpp; {agg['bpp_saving_at_equal_psnr_pct']:+.1f}% "
                      f"bpp at equal PSNR", flush=True)

    out = os.path.join(REPO, "eval_results", "ab_latent_refine.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
