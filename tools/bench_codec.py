"""Real-bitstream codec throughput benchmark (VERDICT r2 item 6).

Measures batched compress/decompress images-per-second-per-chip — the
serving-relevant number — for the three coding paths on Kodak-size
(768x512) images with a briefly-trained flagship-size model (M=128, K=3;
brief training calibrates sigmas so rANS alphabet spans, and therefore
host CDF work, are realistic):

  * joint_ar     — native AVX-512 wavefront AR codec (host-serial context)
  * checkerboard — two-jitted-device-pass codec (batch APIs pipeline the
                   tunnel round-trips; host work is rANS only)
  * hyperprior   — ONE-jitted-device-pass codec (context-free family; the
                   fastest decode in the ladder)
  * channel_cb   — 2·G-jitted-device-pass codec (ELIC-style unevenly
                   grouped space-channel context; G=4 groups)
  * checkerboard/hyperprior portable — fully integer host pipelines (no
                   device in the decode loop at all)

Emits one JSON line per (codec, direction) plus writes BENCH_CODEC.json at
the repo root. Batched paths overlap host rANS with device passes; on this
1-vCPU box the thread-level parallelism adds nothing (noted in the JSON as
host_cpus), so the numbers are a lower bound for multicore serving hosts.

Run detached on the chip (one TPU process at a time — CLAUDE.md):
  PYTHONPATH=.:/root/.axon_site nohup python -u tools/bench_codec.py &
"""

import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

M, K = 128, 3
TRAIN_STEPS = int(os.environ.get("NIC_CODEC_BENCH_TRAIN", "1000"))
BATCH = int(os.environ.get("NIC_CODEC_BENCH_BATCH", "8"))
REPS = int(os.environ.get("NIC_CODEC_BENCH_REPS", "3"))


def _train_briefly(model, key, steps):
    from neural_image_compression_tpu.train.loss import rd_loss

    x0 = jax.random.uniform(key, (8, 256, 256, 3), jnp.float32)
    params = jax.jit(lambda k, x: model.init(
        {"params": k, "noise": k}, x, training=True))(key, x0)["params"]
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(p, o, x, rng):
        def loss_fn(q):
            out = model.apply({"params": q}, x, training=True,
                              rngs={"noise": rng})
            m = rd_loss(out, x, 0.005)
            return m["loss"], m

        (_, m), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, m

    pool = [jax.random.uniform(jax.random.PRNGKey(i), x0.shape, jnp.float32)
            for i in range(4)]
    for i in range(steps):
        params, opt, m = step(params, opt, pool[i % 4], jax.random.PRNGKey(i))
    print(f"  trained {steps} steps, final loss {float(m['loss']):.3f}",
          flush=True)
    return params


def _bench(label, fn, n_imgs):
    fn()  # warm (compiles device programs, builds tables)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn()
    dt = (time.perf_counter() - t0) / REPS
    ips = n_imgs / dt
    print(f"  {label:34s} {dt * 1e3 / n_imgs:7.1f} ms/img  {ips:6.2f} img/s",
          flush=True)
    return {"label": label, "ms_per_img": round(dt * 1e3 / n_imgs, 2),
            "img_per_sec": round(ips, 3)}, out


def main():
    import neural_image_compression_tpu.coding.codec as codec_mod
    from neural_image_compression_tpu.coding.codec import (
        ChannelCheckerboardCodec, CheckerboardCodec, JointARCodec,
        MeanScaleHyperpriorCodec,
    )
    from neural_image_compression_tpu.models import (
        ChannelCheckerboardHierarchical, CheckerboardHierarchical,
        JointAutoregressiveHierarchical, MeanScaleHyperprior,
    )
    from tools import chip_health

    # Chip-health gate (VERDICT r4 item 3): this box has documented silent
    # 2-5x degradation windows; a codec benchmark captured inside one is
    # worthless. Canary BEFORE and AFTER the timed section; if either side
    # is outside the known-good envelope the artifact is written to
    # BENCH_CODEC_degraded.json instead of the committed path (override
    # with NIC_BENCH_ALLOW_DEGRADED=1).
    health_pre = chip_health.gate("pre")

    key = jax.random.PRNGKey(0)
    imgs = np.asarray(jax.random.uniform(
        jax.random.PRNGKey(42), (BATCH, 512, 768, 3)), np.float32)
    imgs_u8 = (imgs * 255).astype(np.uint8)

    results = {"config": {"M": M, "K": K, "batch": BATCH,
                          "image": "768x512", "train_steps": TRAIN_STEPS,
                          "host_cpus": os.cpu_count(), "reps": REPS,
                          "param_fetch": codec_mod._PARAM_FETCH.__name__}}
    rows = []

    for name, Model, Codec in (
            ("joint_ar", JointAutoregressiveHierarchical, JointARCodec),
            ("checkerboard", CheckerboardHierarchical, CheckerboardCodec),
            ("hyperprior", MeanScaleHyperprior, MeanScaleHyperpriorCodec),
            ("channel_cb", ChannelCheckerboardHierarchical,
             ChannelCheckerboardCodec)):
        print(f"[{name}] training ...", flush=True)
        model = Model(latent_channels=M, K=K, dtype=jnp.bfloat16)
        params = _train_briefly(model, key, TRAIN_STEPS)
        codec = Codec(model, {"params": params})

        r, streams = _bench(f"{name} compress_batch({BATCH})",
                            lambda: codec.compress_batch(imgs_u8), BATCH)
        bpp = sum(len(s) for s in streams) * 8 / (BATCH * 512 * 768)
        r["bpp"] = round(bpp, 4)
        rows.append(r)
        r, _ = _bench(f"{name} decompress_batch({BATCH}) u8",
                      lambda: codec.decompress_batch(streams, as_uint8=True),
                      BATCH)
        rows.append(r)
        r, _ = _bench(f"{name} compress(1)",
                      lambda: codec.compress(imgs_u8[:1]), 1)
        rows.append(r)
        r, _ = _bench(f"{name} decompress(1) u8",
                      lambda: codec.decompress(streams[0], as_uint8=True), 1)
        rows.append(r)

        if name in ("checkerboard", "hyperprior", "channel_cb"):
            print("  building portable card ...", flush=True)
            card = codec.portable_card()
            r, pstreams = _bench(
                f"{name} portable compress(x{BATCH})",
                lambda: [codec.compress_portable(imgs_u8[b:b + 1])
                         for b in range(BATCH)], BATCH)
            pbpp = sum(len(s) for s in pstreams) * 8 / (BATCH * 512 * 768)
            r["bpp"] = round(pbpp, 4)
            rows.append(r)
            r, _ = _bench(
                f"{name} portable decompress(x{BATCH}) u8",
                lambda: codec.decompress_batch(pstreams, as_uint8=True),
                BATCH)
            rows.append(r)
            del card

    # f16-vs-f32 parameter-fetch rate delta (one hyperprior image): the
    # f16 fetch is the round-5 default; this records that its measured
    # rate cost is ~0 (both sides upcast the identical f16 values).
    model = MeanScaleHyperprior(latent_channels=M, K=K, dtype=jnp.bfloat16)
    params = _train_briefly(model, key, min(TRAIN_STEPS, 300))
    deltas = {}
    for tag, dt in (("f16", jnp.float16), ("f32", jnp.float32)):
        old = codec_mod._PARAM_FETCH
        codec_mod._PARAM_FETCH = dt
        try:
            c = MeanScaleHyperpriorCodec(model, {"params": params})
            s = c.compress(imgs_u8[:1])
            assert c.decompress(s, as_uint8=True).shape[1:3] == (512, 768)
            deltas[tag] = len(s)
        finally:
            codec_mod._PARAM_FETCH = old
    results["param_fetch_rate_check"] = {
        "bytes_f16": deltas["f16"], "bytes_f32": deltas["f32"],
        "delta_pct": round((deltas["f16"] - deltas["f32"])
                           / deltas["f32"] * 100, 4)}

    health_post = chip_health.gate("post")
    degraded = not (health_pre["healthy"] and health_post["healthy"])
    results["chip_health"] = {"pre": health_pre, "post": health_post,
                              "degraded": degraded}
    results["rows"] = rows
    out_path = os.path.join(REPO, "BENCH_CODEC.json")
    if degraded and os.environ.get("NIC_BENCH_ALLOW_DEGRADED", "") != "1":
        out_path = os.path.join(REPO, "BENCH_CODEC_degraded.json")
        print("chip-health gate FAILED — refusing to write the committed "
              f"artifact; results go to {out_path}", flush=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    for r in rows:
        print(json.dumps(r))
    print(f"-> {out_path}")


if __name__ == "__main__":
    main()
