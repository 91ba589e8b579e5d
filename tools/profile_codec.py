"""Codec latency profile on a (briefly) trained flagship model.

Publishes the enc/dec time split VERDICT r1 asked for: TPU transforms vs
wavefront parameter sweep (context + EP GEMMs) vs CDF-build + rANS, plus
the portable (integer) path for comparison. Trains a few hundred steps
first so latent/sigma statistics are realistic (random init gives all-zero
latents and a trivially fast coder).

Run detached on the chip: PYTHONPATH=. python -u tools/profile_codec.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neural_image_compression_tpu.coding import backend
from neural_image_compression_tpu.coding.codec import JointARCodec
from neural_image_compression_tpu.models import JointAutoregressiveHierarchical
from neural_image_compression_tpu.train.loss import rd_loss

M, K, STEPS = 128, 3, 300


def t_host(fn, *args, iters=5):
    fn(*args)  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        fn(*args)
    return (time.perf_counter() - t0) / iters


def t_device(fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    model = JointAutoregressiveHierarchical(latent_channels=M, K=K,
                                            dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    xtrain = jax.random.uniform(key, (16, 256, 256, 3))
    params = jax.jit(lambda k, x: model.init({"params": k, "noise": k}, x,
                     training=True))(key, xtrain)["params"]
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt, x, rng):
        def loss_fn(p):
            out = model.apply({"params": p}, x, training=True,
                              rngs={"noise": rng})
            m = rd_loss(out, x, 0.005)
            return m["loss"], m

        (_, m), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, m

    print(f"training {STEPS} steps for realistic latent stats ...")
    for i in range(STEPS):
        params, opt, m = step(params, opt, xtrain, jax.random.PRNGKey(i))
    print(f"  loss {float(m['loss']):.2f}, bpp {float(m['bpp_total']):.3f}")

    variables = {"params": params}
    codec = JointARCodec(model, variables)
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(99),
                                      (1, 512, 768, 3)))

    # -- TPU stages -----------------------------------------------------
    t_an = t_device(lambda: codec._analysis_q(variables, jnp.asarray(x)))
    y_q_dev, z_q_dev = codec._analysis_q(variables, jnp.asarray(x))
    y_q = np.asarray(y_q_dev)[0].astype(np.float32)  # int16 off the device
    z_q = np.asarray(z_q_dev)[0]
    t_hs = t_device(lambda: codec._hyper_synthesis(variables,
                                                   jnp.asarray(z_q)[None]))
    (psi_dev,) = codec._hyper_synthesis(variables, jnp.asarray(z_q)[None])
    psi = np.asarray(psi_dev)[0]
    t_sy = t_device(lambda: codec._synthesis(
        variables, jnp.asarray(y_q, jnp.float32)[None]))

    # -- native AR stage ------------------------------------------------
    coder = codec._host_nets.native_coder()
    t_sweep = t_host(lambda: backend.arwave_param_sweep_time(coder, y_q, psi))
    t_enc = t_host(lambda: coder.encode(y_q, psi))
    data = coder.encode(y_q, psi)
    h, w = y_q.shape[:2]
    t_dec = t_host(lambda: coder.decode(data, psi, h, w))

    # -- end-to-end + portable -----------------------------------------
    t_full_enc = t_host(lambda: codec.compress(x), iters=3)
    stream = codec.compress(x)
    t_full_dec = t_host(lambda: codec.decompress(stream), iters=3)

    # uint8 link path: on-device /255 ingest, on-device clip/round/*255 out
    x_u8 = (x * 255).round().astype(np.uint8)
    t_enc_u8 = t_host(lambda: codec.compress(x_u8), iters=3)
    t_dec_u8 = t_host(lambda: codec.decompress(stream, as_uint8=True), iters=3)

    card = codec.portable_card()
    t_hyper_int = t_host(lambda: card.hyper_forward(z_q), iters=1)
    psi_fix = card.hyper_forward(z_q)
    from neural_image_compression_tpu.coding.portable import (
        portable_ar_decode, portable_ar_encode,
    )
    t_penc = t_host(lambda: portable_ar_encode(card, y_q, psi_fix), iters=3)
    pdata = portable_ar_encode(card, y_q, psi_fix)
    t_pdec = t_host(lambda: portable_ar_decode(card, pdata, psi_fix, h, w),
                    iters=3)

    print(f"\n-- per Kodak image (M={M}, K={K}, trained {STEPS} steps) --")
    print(f"TPU analysis+round       {t_an*1e3:8.1f} ms")
    print(f"TPU hyper-synthesis      {t_hs*1e3:8.1f} ms")
    print(f"TPU synthesis            {t_sy*1e3:8.1f} ms")
    print(f"AR param sweep (GEMMs)   {t_sweep*1e3:8.1f} ms")
    print(f"AR encode total          {t_enc*1e3:8.1f} ms  "
          f"(CDF+rANS ~ {max(t_enc-t_sweep,0)*1e3:.1f} ms)")
    print(f"AR decode total          {t_dec*1e3:8.1f} ms  "
          f"(CDF+rANS ~ {max(t_dec-t_sweep,0)*1e3:.1f} ms)")
    print(f"compress() end-to-end    {t_full_enc*1e3:8.1f} ms "
          f"({len(stream)} B, {len(stream)*8/(512*768):.4f} bpp)")
    print(f"decompress() end-to-end  {t_full_dec*1e3:8.1f} ms")
    print(f"compress() uint8 ingest  {t_enc_u8*1e3:8.1f} ms")
    print(f"decompress() as_uint8    {t_dec_u8*1e3:8.1f} ms")
    print(f"portable hyper (int)     {t_hyper_int*1e3:8.1f} ms")
    print(f"portable AR encode (C++) {t_penc*1e3:8.1f} ms "
          f"({len(pdata)} B, {(len(pdata)/len(stream)-1)*100:+.2f}% vs float)")
    print(f"portable AR decode (C++) {t_pdec*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
