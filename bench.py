"""Benchmark: Kodak 768x512 enc+dec images/sec/chip on the flagship model.

Measures the jitted eval forward (training=False) of
JointAutoregressiveHierarchical(M=128, K=3) — the reference's published
GM-Capacity128_K3 config — on Kodak-shaped input. The reference has no
bitstream codec; its Evaluator's per-image eval forward IS its enc+dec
(SURVEY §3.2), so this is the like-for-like throughput metric.

vs_baseline compares against the reference-equivalent torch CPU throughput
measured by tools/measure_torch_baseline.py (BASELINE_MEASURED.json) — the
reference publishes no throughput numbers (SURVEY §6).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

Env knobs: NIC_BENCH_DTYPE=bf16|f32 (transform compute dtype; entropy math is
always f32), NIC_BENCH_ITERS, NIC_BENCH_BATCH, NIC_BENCH_M, NIC_BENCH_K,
NIC_BENCH_FAMILY=joint_ar|checkerboard|hyperprior|channel_cb (model family;
MFU uses the matching analytic FLOP model).
"""

import json
import os
import time

import jax
import jax.numpy as jnp


def _wait_for_backend():
    """The tunneled TPU backend can be transiently unavailable (observed:
    ~30 min of plugin-internal retries ending in UNAVAILABLE). A failed
    init poisons the process-wide backend cache, so recovery means a fresh
    process: sleep and re-exec, bounded by NIC_BENCH_RETRIES (default 5)."""
    try:
        jax.devices()
        return
    except RuntimeError as e:
        import sys

        attempt = int(os.environ.get("_NIC_BENCH_ATTEMPT", "0"))
        limit = int(os.environ.get("NIC_BENCH_RETRIES", "5"))
        if attempt >= limit:
            raise
        print(f"backend unavailable (attempt {attempt + 1}/{limit}): {e}; "
              "retrying in 60s", file=sys.stderr)
        time.sleep(60)
        os.environ["_NIC_BENCH_ATTEMPT"] = str(attempt + 1)
        # re-exec THIS file by absolute path: sys.argv[0] can be a
        # CWD-relative "bench.py" (e.g. set by cli.py's bench subcommand)
        os.execv(sys.executable,
                 [sys.executable, os.path.abspath(__file__)] + sys.argv[1:])


def main():
    from neural_image_compression_tpu.models import (
        ChannelCheckerboardHierarchical, CheckerboardHierarchical,
        JointAutoregressiveHierarchical, MeanScaleHyperprior,
    )
    from neural_image_compression_tpu.train.loss import rd_loss

    _wait_for_backend()

    dtype_name = os.environ.get("NIC_BENCH_DTYPE", "bf16")
    dtype = jnp.bfloat16 if dtype_name == "bf16" else None
    iters = int(os.environ.get("NIC_BENCH_ITERS", "96"))
    batch = int(os.environ.get("NIC_BENCH_BATCH", "48"))
    # model-size stretch knobs (VERDICT r3 item 8): M=192 is the reference's
    # constructor default (Models.py latent_channels=192)
    M = int(os.environ.get("NIC_BENCH_M", "128"))
    KMIX = int(os.environ.get("NIC_BENCH_K", "3"))
    family = os.environ.get("NIC_BENCH_FAMILY", "joint_ar")

    Model = {"joint_ar": JointAutoregressiveHierarchical,
             "checkerboard": CheckerboardHierarchical,
             "hyperprior": MeanScaleHyperprior,
             "channel_cb": ChannelCheckerboardHierarchical}[family]
    model = Model(latent_channels=M, K=KMIX, dtype=dtype)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (batch, 512, 768, 3), jnp.float32)
    params = jax.jit(lambda k, x: model.init({"params": k, "noise": k}, x,
                     training=False))(key, x)["params"]

    @jax.jit
    def eval_step(params, x):
        out = model.apply({"params": params}, x, training=False)
        m = rd_loss(out, x, 0.005)
        # Return scalars only. PSNR depends on x_hat, so the synthesis
        # transform stays live (no DCE) — but the 48x512x768x3 reconstruction
        # is NOT a call result: over the tunneled single-chip backend, call
        # results are transferred to the host eagerly, and returning x_hat
        # turns the benchmark into a tunnel-bandwidth measurement (~860
        # img/s) instead of a chip-throughput one. In serving, x_hat stays
        # on device (or leaves at HBM/PCIe bandwidth, not a debug tunnel's).
        return m["psnr"], m["bpp_total"]

    # Distinct inputs so no caching effect; rotate through 4 buffers.
    inputs = [jax.random.uniform(jax.random.PRNGKey(i), x.shape, jnp.float32)
              for i in range(4)]

    # warmup / compile. NOTE: on the tunneled TPU backend block_until_ready
    # is unreliable; a host scalar fetch is the only real completion barrier.
    psnr, bpp = eval_step(params, inputs[0])
    float(bpp)

    t0 = time.perf_counter()
    for i in range(iters):
        psnr, bpp = eval_step(params, inputs[i % len(inputs)])
    float(bpp)  # device executes enqueued programs in order; this waits for all
    dt = time.perf_counter() - t0
    img_per_sec = iters * batch / dt

    vs_baseline = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_MEASURED.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        vs_baseline = img_per_sec / base["torch_cpu_images_per_sec"]

    # MFU: analytic eval-forward FLOPs over the chip's bf16 peak
    # (NIC_PEAK_TFLOPS overrides; default v5e = 197).
    from neural_image_compression_tpu.utils.flops import (
        channel_cb_eval_flops, hyperprior_eval_flops, joint_ar_eval_flops,
        mfu, train_step_flops,
    )

    # checkerboard's context conv has the same shape as joint_ar's, so the
    # joint FLOP model applies to both; hyperprior drops the context and
    # halves the EP input width; channel_cb swaps in per-group ctx/EP nets
    _flops = {"hyperprior": hyperprior_eval_flops,
              "channel_cb": channel_cb_eval_flops}.get(family,
                                                       joint_ar_eval_flops)
    flops_img = _flops(M, KMIX, 512, 768)["total"]
    peak = float(os.environ.get("NIC_PEAK_TFLOPS", "197"))

    result = {
        "metric": ("kodak_768x512_encdec_images_per_sec_per_chip"
                   f"_batch{batch}" + (f"_M{M}K{KMIX}" if (M, KMIX) != (128, 3)
                                      else "")
                   + (f"_{family}" if family != "joint_ar" else "")),
        "value": round(img_per_sec, 3),
        "unit": "img/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "flops_per_image": flops_img,
        "mfu": round(mfu(img_per_sec, flops_img, peak), 4),
    }

    # Training-step throughput + MFU (the reference's hot loop,
    # Trainer.py:76-86): jitted donated train step, batch 16 of 256^2
    # patches, data on device. NIC_BENCH_TRAIN=0 skips.
    if os.environ.get("NIC_BENCH_TRAIN", "1") != "0":
        import optax

        tb = int(os.environ.get("NIC_BENCH_TRAIN_BATCH", "16"))
        titers = int(os.environ.get("NIC_BENCH_TRAIN_ITERS", "300"))
        xt = jax.random.uniform(jax.random.PRNGKey(7), (tb, 256, 256, 3),
                                jnp.float32)
        tparams = jax.jit(lambda k, x: model.init(
            {"params": k, "noise": k}, x, training=True))(key, xt)["params"]
        tx = optax.adam(1e-4)
        opt = tx.init(tparams)

        from functools import partial

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(p, opt, x, rng):
            def loss_fn(q):
                out = model.apply({"params": q}, x, training=True,
                                  rngs={"noise": rng})
                m = rd_loss(out, x, 0.005)
                return m["loss"], m

            (_, m), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            u, opt = tx.update(g, opt, p)
            return optax.apply_updates(p, u), opt, m

        rngs = [jax.random.PRNGKey(100 + i) for i in range(4)]
        tparams, opt, m = train_step(tparams, opt, xt, rngs[0])
        float(m["loss"])  # compile + completion barrier
        t0 = time.perf_counter()
        for i in range(titers):
            tparams, opt, m = train_step(tparams, opt, xt, rngs[i % 4])
        float(m["loss"])
        tdt = time.perf_counter() - t0
        steps_per_sec = titers / tdt
        tflops_img = train_step_flops(_flops(M, KMIX, 256, 256)["total"])
        result["train_steps_per_sec"] = round(steps_per_sec, 2)
        result["train_batch"] = tb
        result["train_mfu"] = round(
            mfu(steps_per_sec * tb, tflops_img, peak), 4)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
