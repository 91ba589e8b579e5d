"""Train-step time breakdown on the flagship model.

Splits the jitted donated train step into timed sub-programs to locate the
gap between training MFU (~29%) and eval MFU (43.3%):

  * fwd-only (loss eval, training=True: noise quantization + entropy math)
  * fwd+bwd (value_and_grad, no optimizer)
  * full step (fwd+bwd+adam update)
  * noise RNG alone (threefry uniform over the batch latent grids)
  * eval fwd at the same shape for reference

All programs return scalars (tunnel rule: never fetch big arrays from a
timed program). Run detached on the chip:
  PYTHONPATH=.:/root/.axon_site python -u tools/profile_train.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neural_image_compression_tpu.models import JointAutoregressiveHierarchical
from neural_image_compression_tpu.train.loss import rd_loss
from neural_image_compression_tpu.utils.flops import joint_ar_eval_flops

M, K, BATCH, SIDE = 128, 3, 32, 256


def t_prog(fn, *args, iters=30):
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / iters


def main():
    model = JointAutoregressiveHierarchical(latent_channels=M, K=K,
                                            dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (BATCH, SIDE, SIDE, 3), jnp.float32)
    params = jax.jit(lambda k, x: model.init({"params": k, "noise": k}, x,
                     training=True))(key, x)["params"]
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    def loss_fn(p, x, rng):
        out = model.apply({"params": p}, x, training=True,
                          rngs={"noise": rng})
        return rd_loss(out, x, 0.005)["loss"]

    fwd = jax.jit(lambda p, x, rng: loss_fn(p, x, rng))

    # keep every grad leaf live (a bare [0] lets XLA DCE the whole backward)
    def _fb(p, x, rng):
        l, g = jax.value_and_grad(loss_fn)(p, x, rng)
        return l + sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(g))
    fwd_bwd = jax.jit(_fb)

    # adam update alone on a fixed grad pytree
    g0 = jax.jit(lambda p, x, rng: jax.grad(loss_fn)(p, x, rng))(params, x,
                                                                 jax.random.PRNGKey(3))
    adam_only = jax.jit(lambda p, o, g: optax.apply_updates(
        p, tx.update(g, o)[0]))

    @partial(jax.jit, donate_argnums=(0, 1))
    def full_step(p, opt, x, rng):
        l, g = jax.value_and_grad(loss_fn)(p, x, rng)
        u, opt = tx.update(g, opt)
        return optax.apply_updates(p, u), opt, l

    eval_fwd = jax.jit(lambda p, x: rd_loss(
        model.apply({"params": p}, x, training=False), x, 0.005)["loss"])

    # noise RNG alone: three uniform draws at the latent grids (y, z shapes)
    h = SIDE // 16
    noise = jax.jit(lambda rng: (
        jax.random.uniform(rng, (BATCH, h, h, M)).sum()
        + jax.random.uniform(jax.random.fold_in(rng, 1),
                             (BATCH, h // 4, h // 4, M)).sum()))

    rng = jax.random.PRNGKey(7)
    t_fwd = t_prog(fwd, params, x, rng)
    t_fb = t_prog(fwd_bwd, params, x, rng)
    t_adam = t_prog(adam_only, params, opt, g0)
    t_noise = t_prog(noise, rng)
    t_eval = t_prog(eval_fwd, params, x)

    # --- per-component fwd+bwd split: grad of a scalar through each
    # sub-network alone (inputs at that component's real shapes). The sum
    # exceeds t_fb slightly (each program repeats its input prep) but the
    # RATIOS locate the backward sinks the way profile_layers located the
    # eval ones.
    h = SIDE // 16
    y0 = jax.random.normal(jax.random.PRNGKey(11), (BATCH, h, h, M),
                           jnp.float32)
    z0 = jax.random.normal(jax.random.PRNGKey(12), (BATCH, h // 4, h // 4, M),
                           jnp.float32)
    comps = {
        "encoder": (lambda p, v: model.apply(
            {"params": p}, v, method=lambda m, v: m.encoder(v)
        ).astype(jnp.float32).sum(), x),
        "decoder": (lambda p, v: model.apply(
            {"params": p}, v, method=lambda m, v: m.decoder(v)
        ).astype(jnp.float32).sum(), y0),
        "hyper_enc": (lambda p, v: model.apply(
            {"params": p}, v, method=lambda m, v: m.hyper_encoder(v)
        ).astype(jnp.float32).sum(), y0),
        "hyper_dec": (lambda p, v: model.apply(
            {"params": p}, v, method=lambda m, v: m.hyper_decoder(v)
        ).astype(jnp.float32).sum(), z0),
        "context": (lambda p, v: model.apply(
            {"params": p}, v, method=lambda m, v: m.context_model(v)
        ).astype(jnp.float32).sum(), y0),
        "entropy_params+lik": (lambda p, v: _ep_lik(p, v), y0),
    }

    def _ep_lik(p, y_in):
        def body(m, y_in):
            psi = m.hyper_decoder(jnp.round(m.hyper_encoder(y_in)))
            phi = m.context_model(y_in)
            pt = m.entropy_parameters(jnp.concatenate([phi, psi], axis=-1))
            from neural_image_compression_tpu.entropy.gaussian import (
                mixture_likelihood,
            )
            w, mus, sig = pt
            return jnp.log(mixture_likelihood(y_in, w, mus, sig)).sum()
        return model.apply({"params": p}, y_in, method=body)

    comp_times = {}
    for name, (fn, v) in comps.items():
        fb = jax.jit(lambda p, v, fn=fn: (
            fn(p, v) + sum(jnp.sum(t.astype(jnp.float32))
                           for t in jax.tree.leaves(jax.grad(fn)(p, v)))))
        fwd_only = jax.jit(lambda p, v, fn=fn: fn(p, v))
        comp_times[name] = (t_prog(fwd_only, params, v),
                            t_prog(fb, params, v))

    # full step donates: rebuild state each call is wrong; time a chain
    p, o = params, opt
    p, o, _ = full_step(p, o, x, rng)
    _ = float(jax.tree.leaves(p)[0].astype(jnp.float32).sum())
    iters = 60
    t0 = time.perf_counter()
    for i in range(iters):
        p, o, l = full_step(p, o, x, jax.random.PRNGKey(i))
    _ = float(l)
    t_full = (time.perf_counter() - t0) / iters

    img_flop = joint_ar_eval_flops(M, K, SIDE, SIDE)["total"] / 1e9
    ips = BATCH / t_full
    # fwd+bwd ~= 3x fwd FLOPs
    mfu = ips * img_flop * 3 / 1e3 / 197.0
    print(f"-- train-step split (M={M} K={K} batch={BATCH} {SIDE}^2) --")
    print(f"eval fwd            {t_eval*1e3:7.1f} ms  ({BATCH/t_eval:7.0f} img/s)")
    print(f"train fwd           {t_fwd*1e3:7.1f} ms")
    print(f"train fwd+bwd       {t_fb*1e3:7.1f} ms")
    print(f"full step (+adam)   {t_full*1e3:7.1f} ms  ({ips:7.0f} img/s, "
          f"{ips/1.0:.0f})")
    print(f"adam update alone   {t_adam*1e3:7.1f} ms")
    print(f"noise RNG alone     {t_noise*1e3:7.1f} ms")
    print(f"analytic fwd GFLOP/img {img_flop:.2f}; train MFU ~{mfu*100:.1f}% "
          f"(3x-fwd FLOP convention)")
    print(f"bwd/fwd ratio       {(t_fb-t_fwd)/t_fwd:7.2f}")
    print(f"opt overhead        {(t_full-t_fb)*1e3:7.1f} ms")
    print("-- per-component fwd / fwd+bwd (isolated programs) --")
    for name, (tf, tb) in comp_times.items():
        print(f"{name:20s} fwd {tf*1e3:7.1f} ms   fwd+bwd {tb*1e3:7.1f} ms"
              f"   bwd/fwd {(tb-tf)/max(tf,1e-9):5.2f}")


if __name__ == "__main__":
    main()
