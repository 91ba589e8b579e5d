"""Component-level timing of the flagship eval forward on the real chip.

Times each stage of JointAutoregressiveHierarchical(M=128, K=3) eval on
Kodak-shaped input to find where the milliseconds go. One process — the
tunneled TPU misbehaves with concurrent clients. A host scalar fetch is used
as the completion barrier (block_until_ready is unreliable over the tunnel).
"""

import os
import time

import jax
import jax.numpy as jnp

from neural_image_compression_tpu.models import JointAutoregressiveHierarchical
from neural_image_compression_tpu.train.loss import rd_loss

M, K = 128, 3
DTYPE = jnp.bfloat16


def timeit(fn, *args, iters=10, label=""):
    """Times a jitted fn over the tunnel. The timed program returns ONLY a
    scalar (sum of the first output leaf): over the tunneled backend, large
    call RESULTS appear to be transferred eagerly, so timing a program that
    returns a big array measures the tunnel's bandwidth, not the device.
    The real output (for feeding the next stage) comes from one extra
    untimed call of the raw fn."""
    scalar_fn = jax.jit(lambda *a: jnp.sum(jax.tree.leaves(fn(*a))[0]))
    _ = float(scalar_fn(*args))  # compile + barrier
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        scalar_fn(*args)
    _ = float(scalar_fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:32s} {dt*1000:8.2f} ms")
    return fn(*args), dt


def main():
    model = JointAutoregressiveHierarchical(latent_channels=M, K=K, dtype=DTYPE)
    key = jax.random.PRNGKey(0)
    batch = int(os.environ.get("NIC_PROFILE_BATCH", "1"))
    x = jax.random.uniform(key, (batch, 512, 768, 3), jnp.float32)
    params = jax.jit(lambda k, x: model.init({"params": k, "noise": k}, x,
                     training=False))(key, x)["params"]
    v = {"params": params}

    enc = jax.jit(lambda v, x: model.apply(v, x, method=lambda m, x: m.encoder(x)))
    dec = jax.jit(lambda v, y: model.apply(v, y, method=lambda m, y: m.decoder(y)))
    henc = jax.jit(lambda v, y: model.apply(v, y, method=lambda m, y: m.hyper_encoder(y)))
    hdec = jax.jit(lambda v, z: model.apply(v, z, method=lambda m, z: m.hyper_decoder(z)))
    ctx = jax.jit(lambda v, y: model.apply(v, y, method=lambda m, y: m.context_model(y)))

    def ep_and_lik(v, y_in, z_in):
        def f(m, y_in, z_in):
            p = m.entropy_params_from_latents(y_in, z_in)
            from neural_image_compression_tpu.entropy.gaussian import mixture_likelihood
            w, mus, sigmas = p
            return mixture_likelihood(y_in, w, mus, sigmas)
        return model.apply(v, y_in, z_in, method=f)

    ep_lik = jax.jit(ep_and_lik)

    # psnr (not bpp_total) keeps the synthesis transform live: bpp doesn't
    # depend on x_hat, so returning bpp alone DCEs the whole decoder.
    full = jax.jit(lambda v, x: rd_loss(
        model.apply(v, x, training=False), x, 0.005)["psnr"])

    y, _ = timeit(enc, v, x, label="encoder (x16 down)")
    z, _ = timeit(henc, v, y, label="hyper_encoder")
    y_q = jnp.round(y.astype(jnp.float32))
    z_q = jnp.round(z.astype(jnp.float32))
    timeit(hdec, v, z_q, label="hyper_decoder")
    timeit(ctx, v, y_q, label="context (masked conv)")
    timeit(ep_lik, v, y_q, z_q, label="entropy params + GMM lik")
    timeit(dec, v, y_q, label="decoder (x16 up)")
    timeit(full, v, x, label="FULL eval fwd + rd_loss")

    # deconv strategy comparison: lhs_dilation vs phase-decomposed
    from neural_image_compression_tpu.ops.conv import deconv2d

    key2 = jax.random.PRNGKey(1)
    xin = jax.random.normal(key2, (1, 128, 192, 128), DTYPE)
    w = jax.random.normal(key2, (5, 5, 128, 128), DTYPE) * 0.05

    d1 = jax.jit(lambda x, w: deconv2d(x, w, stride=2, padding=2, output_padding=1))
    timeit(d1, xin, w, label="deconv 128->256 lhs_dilation")


if __name__ == "__main__":
    main()
