"""Round-2 capstone: full reference training schedule on one chip, then the
float and PORTABLE codecs on the converged model.

Purpose: (a) re-time the 100k-step flagship schedule after the round-2
lowering work; (b) measure the portable mode's true rate cost on a
CONVERGED model (unit tests use random init; the 300-step profile model had
miscalibrated sigmas that confound the comparison); (c) assert the
cross-implementation bit-identity on converged statistics.

Run detached: PYTHONPATH=. nohup python -u tools/round2_capstone.py &
"""

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

import neural_image_compression_tpu as nic
from tools.train_at_scale import make_synthetic_dataset

M, K, STEPS, BATCH = 128, 3, 100_000, 16


def main():
    tr_dir, va_dir = make_synthetic_dataset("/tmp/nic_scale/data")
    ds = nic.data.ImageFolderDataset(tr_dir, cache=True)
    # on-device batch pool (the host pipeline is benchmarked elsewhere;
    # here the chip should never wait on the 1-vCPU host)
    pool = []
    rng = np.random.RandomState(0)
    for b in range(12):
        idx = rng.randint(0, len(ds), BATCH)
        pool.append(jnp.asarray(np.stack([ds[int(i)] for i in idx])))

    model = nic.models.JointAutoregressiveHierarchical(
        latent_channels=M, K=K, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda k, x: model.init(
        {"params": k, "noise": k}, x, training=True))(key, pool[0])["params"]
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt, x, rng):
        def loss_fn(p):
            out = model.apply({"params": p}, x, training=True,
                              rngs={"noise": rng})
            m = nic.train.rd_loss(out, x, 0.005)
            return m["loss"], m

        (_, m), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, m

    print(f"training {STEPS} steps (batch {BATCH}, on-device pool) ...",
          flush=True)
    t0 = time.perf_counter()
    for i in range(STEPS):
        params, opt, m = step(params, opt, pool[i % len(pool)],
                              jax.random.PRNGKey(i))
        if i % 10_000 == 0:
            print(f"  step {i}: loss {float(m['loss']):.3f} "
                  f"bpp {float(m['bpp_total']):.4f} "
                  f"psnr {float(m['psnr']):.2f} "
                  f"({(time.perf_counter()-t0):.0f}s)", flush=True)
    float(m["loss"])
    wall = time.perf_counter() - t0
    print(f"100k steps in {wall/60:.1f} min ({STEPS/wall:.1f} steps/s)",
          flush=True)

    variables = {"params": params}
    img = nic.data.load_image(os.path.join(va_dir, "v1.png"))[None]
    out = jax.jit(lambda v, x: model.apply(v, x, training=False))(
        variables, jnp.asarray(img))
    rd = nic.train.rd_loss(out, jnp.asarray(img), 0.005)
    met = nic.evaluation.compute_metrics(jnp.asarray(img),
                                         jnp.clip(out["x_hat"], 0, 1))
    analytic_bpp = float(rd["bpp_total"])
    print(f"eval: analytic bpp={analytic_bpp:.4f} "
          f"psnr={float(met['PSNR(RGB)']):.2f} "
          f"msssim={float(met['MS-SSIM(RGB)']):.4f}", flush=True)

    h, w = img.shape[1:3]
    codec = nic.coding.JointARCodec(model, variables)
    t0 = time.perf_counter()
    data_f = codec.compress(img)
    t1 = time.perf_counter()
    xr = codec.decompress(data_f)
    t2 = time.perf_counter()
    # warm pass (first includes jit compiles)
    t0 = time.perf_counter()
    data_f = codec.compress(img)
    t1 = time.perf_counter()
    xr = codec.decompress(data_f)
    t2 = time.perf_counter()
    bpp_f = len(data_f) * 8 / (h * w)
    exact = np.allclose(xr, np.clip(np.asarray(out["x_hat"]), 0, 1), atol=1e-5)
    print(f"float codec: {bpp_f:.4f} bpp ({(bpp_f/analytic_bpp-1)*100:+.2f}% "
          f"vs analytic), enc {t1-t0:.2f}s dec {t2-t1:.2f}s, exact={exact}",
          flush=True)

    print("building portable card ...", flush=True)
    card = codec.portable_card()
    t0 = time.perf_counter()
    data_p = codec.compress_portable(img)
    t1 = time.perf_counter()
    xp = codec.decompress(data_p)
    t2 = time.perf_counter()
    bpp_p = len(data_p) * 8 / (h * w)
    print(f"portable codec: {bpp_p:.4f} bpp ({(bpp_p/bpp_f-1)*100:+.2f}% vs "
          f"float path, {(bpp_p/analytic_bpp-1)*100:+.2f}% vs analytic), "
          f"enc {t1-t0:.2f}s dec {t2-t1:.2f}s, "
          f"recon==float-path: {np.array_equal(xp, xr)}", flush=True)

    # cross-implementation bit-identity on converged stats
    y_q_dev, z_q_dev = codec._analysis_q(variables, jnp.asarray(
        nic.data.pad_to_multiple(np.asarray(img, np.float32), 64)))
    y_q = np.asarray(y_q_dev)[0].astype(np.float32)
    z_q = np.asarray(z_q_dev)[0]
    psi_fix = card.hyper_forward(z_q)
    s_cc = nic.coding.portable_ar_encode(card, y_q, psi_fix, native=True)
    s_py = nic.coding.portable_ar_encode(card, y_q, psi_fix, native=False)
    print(f"converged-model native==numpy portable streams: {s_cc == s_py}",
          flush=True)


if __name__ == "__main__":
    main()
