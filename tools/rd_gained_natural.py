"""Does ONE variable-rate (gained) model match N fixed-rate models?

Trains a single GainedHyperprior on the natural-ish corpus with per-step
level sampling (the Trainer's wiring, here inline), levels = the same
lambda ladder as tools/rd_curves_natural.py, then evaluates every integer
level (analytic + measured bitstream through the FOLDED fixed-rate codec)
and reports BD-rate of the gained curve against the fixed-rate hyperprior
curve from rd_curves_natural.json (run that first).

The standard result this framework should reproduce (Cui et al. CVPR'21):
a small BD-rate penalty (a few %) for spanning the whole curve with one
set of transform weights. Writes eval_results/rd_gained_natural.json.

Run detached on the chip (one TPU process at a time — CLAUDE.md):
  PYTHONPATH=.:/root/.axon_site nohup python -u tools/rd_gained_natural.py &
"""

import json
import os
import pickle
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

M, K = 128, 3
STEPS = int(os.environ.get("NIC_GAINED_STEPS", "100000"))
BATCH = 16
LEVELS = tuple(float(v) for v in os.environ.get(
    "NIC_GAINED_LEVELS", "0.001,0.005,0.02,0.08").split(","))
STATE = os.environ.get("NIC_GAINED_STATE", "/tmp/nic_rd_gained_natural")


def _data():
    from tools.synth_natural import make_natural_dataset

    from neural_image_compression_tpu.data import ImageFolderDataset

    tr_dir, va_dir = make_natural_dataset("/tmp/nic_natural/data")
    ds = ImageFolderDataset(tr_dir, cache=True)
    rng = np.random.RandomState(0)
    pool = []
    for _ in range(12):
        idx = rng.randint(0, len(ds), BATCH)
        pool.append(jnp.asarray(np.stack([ds[int(i)] for i in idx])))
    val = ImageFolderDataset(va_dir, cache=True)
    vals = [np.asarray(val[i])[None] for i in range(len(val))]
    return pool, vals


def main():
    from neural_image_compression_tpu.coding.codec import (
        MeanScaleHyperpriorCodec,
    )
    from neural_image_compression_tpu.evaluation.bdrate import bd_rate
    from neural_image_compression_tpu.evaluation.msssim import ms_ssim
    from neural_image_compression_tpu.models import (
        GainedHyperprior, fold_gains, folded_model,
    )
    from neural_image_compression_tpu.parallel.train_step import (
        make_train_step,
    )
    from neural_image_compression_tpu.train.loss import rd_loss

    os.makedirs(STATE, exist_ok=True)
    pool, vals = _data()
    model = GainedHyperprior(latent_channels=M, K=K, levels=LEVELS,
                             dtype=jnp.bfloat16)

    pk = os.path.join(STATE, "gained.pkl")
    if os.path.exists(pk + ".ok"):
        print("[gained] cached params", flush=True)
        with open(pk, "rb") as f:
            params = jax.tree.map(jnp.asarray, pickle.load(f))
    else:
        key = jax.random.PRNGKey(0)
        params = jax.jit(lambda k, x: model.init(
            {"params": k, "noise": k}, x, training=True))(
                key, pool[0])["params"]
        tx = optax.adam(1e-4)
        opt = tx.init(params)
        step = make_train_step(model, tx, rd_loss, 0.005, levels=LEVELS)
        print(f"[gained] training {STEPS} level-sampled steps ...",
              flush=True)
        t0 = time.time()
        for i in range(STEPS):
            params, opt, m = step(params, opt, pool[i % len(pool)],
                                  jax.random.PRNGKey(i))
            if i % 10_000 == 0:
                print(f"  [gained] step {i} loss {float(m['loss']):.4f} "
                      f"({(i + 1) / (time.time() - t0):.0f} steps/s)",
                      flush=True)
        print(f"[gained] done in {(time.time() - t0) / 60:.1f} min",
              flush=True)
        with open(pk, "wb") as f:
            pickle.dump(jax.device_get(params), f)
        open(pk + ".ok", "w").write("ok")

    mss = jax.jit(lambda a, b: ms_ssim(jnp.clip(a, 0.0, 1.0), b))
    pts = []
    fm = folded_model(model)
    fwd = jax.jit(lambda p, x: fm.apply({"params": p}, x, training=False))
    for li, lam in enumerate(LEVELS):
        fp = fold_gains(params, li)
        codec = MeanScaleHyperpriorCodec(fm, {"params": fp})
        rows = []
        for v in vals:
            x = jnp.asarray(v)
            out = fwd(fp, x)
            m = rd_loss(out, x, lam)
            data = codec.compress((v * 255).astype(np.uint8))
            h, w = v.shape[1:3]
            rows.append({"bpp": float(m["bpp_total"]),
                         "measured_bpp": len(data) * 8 / (h * w),
                         "psnr": float(m["psnr"]),
                         "msssim": float(mss(out["x_hat"], x))})
        res = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
        res["level"], res["lambda"] = li, lam
        pts.append(res)
        print(f"[gained@level {li}] {json.dumps(res)}", flush=True)

    out = {"config": {"M": M, "K": K, "steps": STEPS, "batch": BATCH,
                      "levels": list(LEVELS), "corpus": "natural"},
           "gained_curve": pts}
    fixed_path = os.path.join(REPO, "eval_results", "rd_curves_natural.json")
    if os.path.exists(fixed_path):
        with open(fixed_path) as f:
            fixed = json.load(f)["curves"].get("hyperprior")
        if fixed:
            try:
                out["bd_rate_vs_fixed_hyperprior_pct"] = bd_rate(fixed, pts)
                out["bd_rate_vs_fixed_hyperprior_measured_pct"] = bd_rate(
                    [{"bpp": p["measured_bpp"], "psnr": p["psnr"]}
                     for p in fixed],
                    [{"bpp": p["measured_bpp"], "psnr": p["psnr"]}
                     for p in pts])
            except ValueError as e:
                out["bd_rate_error"] = str(e)

    path = os.path.join(REPO, "eval_results", "rd_gained_natural.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "gained_curve"},
                     indent=1))
    print(f"-> {path}")


if __name__ == "__main__":
    main()
