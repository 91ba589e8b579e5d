"""Converged RD + latency ladder across ALL FOUR context-model families.

Trains factorized, hyperprior, checkerboard, and joint_ar (M=128, K=3
where applicable, bf16 transforms) with the reference's full 100k-step
schedule (Main.ipynb) at the flagship lambda=0.005 on the same synthetic
corpus, then evaluates each on held-out Kodak-size images: analytic RD,
REAL measured bitstream bpp, and warm single-image codec latency.

The artifact answers "which family should I deploy": the ladder trades
rate for decode parallelism —

    factorized      (no hyper)     1 fully-parallel pass, highest rate
    hyperprior      (no context)   1 device pass for all entropy params
    checkerboard    (He CVPR'21)   2 device passes
    joint_ar        (Minnen'18)    host wavefront (serial context), best rate

Complements eval_results/ab_checkerboard_rd.json (2-lambda checkerboard vs
joint_ar A/B from earlier this round); this adds the two context-free rungs
at the reference's published operating point.

Writes eval_results/rd_ladder.json + prints a table.

NIC_LADDER_CORPUS=natural switches to the structured, noise-light corpus
(tools/synth_natural.py) where RD curves behave like natural-photo curves
(the default noise corpus saturates PSNR near 26 dB at any rate and swamps
the context models' rate advantage with incompressible bits); artifact
then goes to eval_results/rd_ladder_natural.json with its own state dir.

Run detached on the chip (one TPU process at a time — CLAUDE.md):
  PYTHONPATH=.:/root/.axon_site nohup python -u tools/rd_ladder.py &
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
STEPS = int(os.environ.get("NIC_LADDER_STEPS", "100000"))
BATCH = 16
LAM = float(os.environ.get("NIC_LADDER_LAMBDA", "0.005"))
CORPUS = os.environ.get("NIC_LADDER_CORPUS", "noise")
_DEFAULT_STATE = ("/tmp/nic_rd_ladder" if CORPUS == "noise"
                  else f"/tmp/nic_rd_ladder_{CORPUS}")
STATE = os.environ.get("NIC_LADDER_STATE", _DEFAULT_STATE)


def _data_pool():
    import sys

    sys.path.insert(0, REPO)
    from neural_image_compression_tpu.data import ImageFolderDataset

    if CORPUS == "natural":
        from tools.synth_natural import make_natural_dataset

        tr_dir, va_dir = make_natural_dataset("/tmp/nic_natural/data")
    else:
        from tools.train_at_scale import make_synthetic_dataset

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


def _train(model, pool, lam, tag):
    from neural_image_compression_tpu.train.loss import rd_loss

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
            m = rd_loss(out, x, lam)
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


def _eval(model, params, codec, vals, lam):
    from neural_image_compression_tpu.train.loss import rd_loss

    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x, training=False))
    rows = []
    enc_ms, dec_ms = [], []
    for v in vals:
        x = jnp.asarray(v)
        out = fwd(params, x)
        m = rd_loss(out, x, lam)
        u8 = (v * 255).astype(np.uint8)
        data = codec.compress(u8)           # warm; timed pass below
        t0 = time.perf_counter()
        data = codec.compress(u8)
        enc_ms.append((time.perf_counter() - t0) * 1e3)
        codec.decompress(data, as_uint8=True)
        t0 = time.perf_counter()
        codec.decompress(data, as_uint8=True)
        dec_ms.append((time.perf_counter() - t0) * 1e3)
        h, w = v.shape[1:3]
        rows.append({
            "analytic_bpp": float(m["bpp_total"]),
            "measured_bpp": len(data) * 8 / (h * w),
            "psnr": float(m["psnr"]),
        })
    mean = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    mean["enc_ms"] = float(np.median(enc_ms))
    mean["dec_ms"] = float(np.median(dec_ms))
    mean["stream_vs_analytic_pct"] = 100.0 * (
        mean["measured_bpp"] / mean["analytic_bpp"] - 1.0)
    return mean


def main():
    from neural_image_compression_tpu.coding.codec import (
        CheckerboardCodec, FactorizedPriorCodec, JointARCodec,
        MeanScaleHyperpriorCodec,
    )
    from neural_image_compression_tpu.models import (
        CheckerboardHierarchical, FactorizedPrior,
        JointAutoregressiveHierarchical, MeanScaleHyperprior,
    )

    os.makedirs(STATE, exist_ok=True)
    pool, vals = _data_pool()
    out = {"config": {"M": M, "K": K, "steps": STEPS, "batch": BATCH,
                      "lambda": LAM, "corpus": CORPUS,
                      "image": "768x512 synthetic"}}
    ladder = {}

    families = (
        ("factorized", lambda: FactorizedPrior(latent_channels=M,
                                               dtype=jnp.bfloat16),
         FactorizedPriorCodec),
        ("hyperprior", lambda: MeanScaleHyperprior(latent_channels=M, K=K,
                                                   dtype=jnp.bfloat16),
         MeanScaleHyperpriorCodec),
        ("checkerboard", lambda: CheckerboardHierarchical(
            latent_channels=M, K=K, dtype=jnp.bfloat16), CheckerboardCodec),
        ("joint_ar", lambda: JointAutoregressiveHierarchical(
            latent_channels=M, K=K, dtype=jnp.bfloat16), JointARCodec),
    )
    for fam, make_model, Codec in families:
        tag = f"{fam}@{LAM}"
        model = make_model()
        pk = os.path.join(STATE, f"{fam}_{LAM}.pkl")
        if os.path.exists(pk + ".ok"):
            print(f"[{tag}] cached params", flush=True)
            with open(pk, "rb") as f:
                params = pickle.load(f)
            params = jax.tree.map(jnp.asarray, params)
        else:
            print(f"[{tag}] training {STEPS} steps ...", flush=True)
            params = _train(model, pool, LAM, tag)
            with open(pk, "wb") as f:
                pickle.dump(jax.device_get(params), f)
            open(pk + ".ok", "w").write("ok")
        codec = Codec(model, {"params": params})
        res = _eval(model, params, codec, vals, LAM)
        ladder[fam] = res
        print(f"[{tag}] {json.dumps(res)}", flush=True)

    out["ladder"] = ladder
    name = ("rd_ladder.json" if CORPUS == "noise"
            else f"rd_ladder_{CORPUS}.json")
    path = os.path.join(REPO, "eval_results", name)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{'family':14s} {'analytic':>9s} {'measured':>9s} {'psnr':>6s} "
          f"{'enc ms':>7s} {'dec ms':>7s}")
    for fam, r in ladder.items():
        print(f"{fam:14s} {r['analytic_bpp']:9.4f} {r['measured_bpp']:9.4f} "
              f"{r['psnr']:6.2f} {r['enc_ms']:7.0f} {r['dec_ms']:7.0f}")
    print(f"-> {path}")


if __name__ == "__main__":
    main()
