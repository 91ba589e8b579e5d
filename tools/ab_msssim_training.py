"""Does the MS-SSIM training objective actually buy MS-SSIM? (A/B)

Trains the flagship (M=128, K=3, bf16 transforms) twice on the same
synthetic corpus with the reference schedule: once with the reference MSE
objective (rd_loss, lambda=0.005) and once with the perceptual objective
(msssim_rd_loss) at a lambda picked to land near the same rate, then
evaluates both on held-out Kodak-size images: bpp, PSNR, MS-SSIM.

Expected (the standard result this framework should reproduce): at matched
rate, the MS-SSIM-trained model wins MS-SSIM and loses PSNR — each
objective optimizes its own metric. The artifact gives users the measured
trade so they can pick a training mode on data.

Writes eval_results/ab_msssim_training.json.

Run detached on the chip (one TPU process at a time — CLAUDE.md):
  PYTHONPATH=.:/root/.axon_site nohup python -u tools/ab_msssim_training.py &
"""

import json
import os
import pickle
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

M, K = 128, 3
STEPS = int(os.environ.get("NIC_AB_MSSSIM_STEPS", "100000"))
BATCH = 16
LAM_MSE = 0.005
# compressai's ms-ssim ladder spans ~2.4-60; 8.73 lands near the mid rates.
LAM_MSSSIM = float(os.environ.get("NIC_AB_MSSSIM_LAMBDA", "8.73"))
STATE = os.environ.get("NIC_AB_MSSSIM_STATE", "/tmp/nic_ab_msssim")


def _data_pool():
    import sys

    sys.path.insert(0, REPO)
    from tools.train_at_scale import make_synthetic_dataset

    from neural_image_compression_tpu.data import ImageFolderDataset

    tr_dir, va_dir = make_synthetic_dataset("/tmp/nic_scale/data")
    ds = ImageFolderDataset(tr_dir, cache=True)
    rng = np.random.RandomState(0)
    pool = []
    for _ in range(12):
        idx = rng.randint(0, len(ds), BATCH)
        pool.append(jnp.asarray(np.stack([ds[int(i)] for i in idx])))
    val = ImageFolderDataset(va_dir, cache=True)
    vals = [np.asarray(val[i])[None] for i in range(len(val))]
    return pool, vals


def _train(model, pool, loss_fn_builder, tag):
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda k, x: model.init(
        {"params": k, "noise": k}, x, training=True))(key, pool[0])["params"]
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(p, o, x, rng):
        def loss_fn(q):
            out = model.apply({"params": q}, x, training=True,
                              rngs={"noise": rng})
            m = loss_fn_builder(out, x)
            return m["loss"], m

        (_, m), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, m

    t0 = time.time()
    for i in range(STEPS):
        params, opt, m = step(params, opt, pool[i % len(pool)],
                              jax.random.PRNGKey(i))
        if i % 10_000 == 0:
            print(f"  [{tag}] step {i} loss {float(m['loss']):.3f} "
                  f"({(i + 1) / (time.time() - t0):.0f} steps/s)", flush=True)
    print(f"  [{tag}] done in {(time.time() - t0) / 60:.1f} min", flush=True)
    return params


def _eval(model, params, vals):
    from neural_image_compression_tpu.evaluation.msssim import ms_ssim
    from neural_image_compression_tpu.train.loss import rd_loss

    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x, training=False))
    mss = jax.jit(lambda a, b: ms_ssim(jnp.clip(a, 0.0, 1.0), b))
    rows = []
    for v in vals:
        x = jnp.asarray(v)
        out = fwd(params, x)
        m = rd_loss(out, x, LAM_MSE)
        rows.append({"bpp": float(m["bpp_total"]), "psnr": float(m["psnr"]),
                     "msssim": float(mss(out["x_hat"], x))})
    return {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}


def main():
    from neural_image_compression_tpu.models import (
        JointAutoregressiveHierarchical,
    )
    from neural_image_compression_tpu.train.loss import msssim_rd_loss, rd_loss

    os.makedirs(STATE, exist_ok=True)
    pool, vals = _data_pool()
    out = {"config": {"M": M, "K": K, "steps": STEPS, "batch": BATCH,
                      "lambda_mse": LAM_MSE, "lambda_msssim": LAM_MSSSIM,
                      "image": "768x512 synthetic"}}

    arms = (
        ("mse", lambda o, x: rd_loss(o, x, LAM_MSE)),
        ("msssim", lambda o, x: msssim_rd_loss(o, x, LAM_MSSSIM)),
    )
    for tag, builder in arms:
        model = JointAutoregressiveHierarchical(latent_channels=M, K=K,
                                                dtype=jnp.bfloat16)
        pk = os.path.join(STATE, f"{tag}.pkl")
        if os.path.exists(pk + ".ok"):
            print(f"[{tag}] cached params", flush=True)
            with open(pk, "rb") as f:
                params = jax.tree.map(jnp.asarray, pickle.load(f))
        else:
            print(f"[{tag}] training {STEPS} steps ...", flush=True)
            params = _train(model, pool, builder, tag)
            with open(pk, "wb") as f:
                pickle.dump(jax.device_get(params), f)
            open(pk + ".ok", "w").write("ok")
        res = _eval(model, params, vals)
        out[tag] = res
        print(f"[{tag}] {json.dumps(res)}", flush=True)

    path = os.path.join(REPO, "eval_results", "ab_msssim_training.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print(f"-> {path}")


if __name__ == "__main__":
    main()
