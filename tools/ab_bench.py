"""A/B experiments on the real chip: Pallas GMM kernel vs XLA fusion, and
batch scaling of the flagship eval forward."""

import time

import jax
import jax.numpy as jnp

from neural_image_compression_tpu.models import JointAutoregressiveHierarchical
from neural_image_compression_tpu.ops.pallas.gmm_kernel import (
    fused_mixture_log_likelihood, mixture_log_likelihood_reference,
)
from neural_image_compression_tpu.train.loss import rd_loss

M, K = 128, 3


def bench_fn(fn, args, iters=30, label=""):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:44s} {dt*1000:8.3f} ms", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    # GMM likelihood on Kodak-sized latents (48*32 = 1536 positions)
    n = 1536
    ks = jax.random.split(key, 4)
    y = jnp.round(3 * jax.random.normal(ks[0], (n, M)))
    w = jax.nn.softmax(jax.random.normal(ks[1], (n, K, M)), axis=1)
    mus = 2 * jax.random.normal(ks[2], (n, K, M))
    sig = jax.nn.softplus(jax.random.normal(ks[3], (n, K, M))) + 1e-6

    ref = jax.jit(mixture_log_likelihood_reference)
    pal = jax.jit(lambda *a: fused_mixture_log_likelihood(*a, block_n=256))
    bench_fn(ref, (y, w, mus, sig), label="GMM loglik XLA (1536x3x128)")
    bench_fn(pal, (y, w, mus, sig), label="GMM loglik Pallas")
    # correctness on-device
    d = float(jnp.max(jnp.abs(ref(y, w, mus, sig) - pal(y, w, mus, sig))))
    print(f"max |diff| = {d:.3e}", flush=True)

    # batch scaling of the full eval fwd
    model = JointAutoregressiveHierarchical(latent_channels=M, K=K,
                                            dtype=jnp.bfloat16)
    x1 = jax.random.uniform(key, (1, 512, 768, 3), jnp.float32)
    params = jax.jit(lambda k, x: model.init(
        {"params": k, "noise": k}, x, training=False))(key, x1)["params"]

    @jax.jit
    def eval_step(params, x):
        out = model.apply({"params": params}, x, training=False)
        return rd_loss(out, x, 0.005)["bpp_total"]

    for b in (1, 2, 4, 8):
        xb = jax.random.uniform(key, (b, 512, 768, 3), jnp.float32)
        dt = bench_fn(eval_step, (params, xb), iters=24,
                      label=f"flagship eval fwd batch={b}")
        print(f"    -> {b/dt:8.1f} img/s", flush=True)

    # f32 variant for reference
    model32 = JointAutoregressiveHierarchical(latent_channels=M, K=K)
    params32 = jax.jit(lambda k, x: model32.init(
        {"params": k, "noise": k}, x, training=False))(key, x1)["params"]

    @jax.jit
    def eval_step32(params, x):
        out = model32.apply({"params": params}, x, training=False)
        return rd_loss(out, x, 0.005)["bpp_total"]

    dt = bench_fn(eval_step32, (params32, x1), iters=24,
                  label="flagship eval fwd batch=1 f32")
    print(f"    -> {1/dt:8.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
