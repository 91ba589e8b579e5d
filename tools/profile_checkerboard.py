"""Checkerboard vs joint-AR codec latency on the real chip.

The checkerboard codec's claim is architectural: decode has NO serial host
AR stage — two jitted device passes replace the h+w wavefront sweep. This
measures what that buys end-to-end on Kodak-size images against the
joint-AR wavefront codec (both flagship-size M=128 K=3, both briefly
trained so latent/sigma stats are realistic), plus the rate each model
achieves on the same data (the RD cost of giving up the serial context).

Run detached on the chip: PYTHONPATH=. python -u tools/profile_checkerboard.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neural_image_compression_tpu.coding.codec import (
    CheckerboardCodec, JointARCodec,
)
from neural_image_compression_tpu.models import (
    CheckerboardHierarchical, JointAutoregressiveHierarchical,
)
from neural_image_compression_tpu.train.loss import rd_loss

M, K, STEPS = 128, 3, 300


def t_host(fn, *args, iters=5):
    fn(*args)  # warm (compiles)
    t0 = time.perf_counter()
    for _ in range(iters):
        fn(*args)
    return (time.perf_counter() - t0) / iters


def train(model, steps=STEPS):
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

    t0 = time.perf_counter()
    for i in range(steps):
        params, opt, m = step(params, opt, xtrain, jax.random.PRNGKey(i))
    loss = float(m["loss"])  # host fetch = completion barrier
    dt = time.perf_counter() - t0
    print(f"  {steps} steps in {dt:.1f}s ({steps/dt:.1f} steps/s), "
          f"loss {loss:.2f}, bpp {float(m['bpp_total']):.3f}")
    return {"params": params}


def eval_bpp(model, variables, x):
    @jax.jit
    def prog(v, x):
        out = model.apply(v, x, training=False)
        n = x.shape[0] * x.shape[1] * x.shape[2]
        return -(jnp.sum(out["logp_y"]) + jnp.sum(out["logp_z"])) / (
            jnp.log(2.0) * n)
    return float(prog(variables, x))


def main():
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(99),
                                      (1, 512, 768, 3)))
    results = {}
    for name, model, codec_cls in (
        ("joint_ar", JointAutoregressiveHierarchical(
            latent_channels=M, K=K, dtype=jnp.bfloat16), JointARCodec),
        ("checkerboard", CheckerboardHierarchical(
            latent_channels=M, K=K, dtype=jnp.bfloat16), CheckerboardCodec),
    ):
        print(f"[{name}] training {STEPS} steps ...")
        variables = train(model)
        codec = codec_cls(model, variables)
        t_enc = t_host(lambda: codec.compress(x), iters=5)
        stream = codec.compress(x)
        t_dec = t_host(lambda: codec.decompress(stream), iters=5)
        t_dec_u8 = t_host(lambda: codec.decompress(stream, as_uint8=True),
                          iters=5)
        bpp_a = eval_bpp(model, variables, jnp.asarray(x))
        bpp_s = len(stream) * 8 / (512 * 768)
        results[name] = (t_enc, t_dec, t_dec_u8, bpp_s, bpp_a)
        print(f"  compress {t_enc*1e3:7.1f} ms | decompress {t_dec*1e3:7.1f} ms"
              f" (as_uint8 {t_dec_u8*1e3:7.1f} ms) | stream {bpp_s:.4f} bpp "
              f"(analytic {bpp_a:.4f}, {bpp_s/bpp_a-1:+.2%})")

    ja, cb = results["joint_ar"], results["checkerboard"]
    print("\n-- checkerboard vs joint-AR wavefront (Kodak-size, per image) --")
    print(f"encode  {ja[0]*1e3:7.1f} -> {cb[0]*1e3:7.1f} ms ({ja[0]/cb[0]:.1f}x)")
    print(f"decode  {ja[1]*1e3:7.1f} -> {cb[1]*1e3:7.1f} ms ({ja[1]/cb[1]:.1f}x)")
    print(f"decode (uint8 out) {ja[2]*1e3:7.1f} -> {cb[2]*1e3:7.1f} ms "
          f"({ja[2]/cb[2]:.1f}x)")
    print(f"rate at equal {STEPS}-step training: joint_ar {ja[3]:.4f} bpp, "
          f"checkerboard {cb[3]:.4f} bpp ({cb[3]/ja[3]-1:+.2%} — "
          f"NOT an RD verdict at {STEPS} steps; the paper's converged gap "
          f"is ~2-4%)")


if __name__ == "__main__":
    main()
