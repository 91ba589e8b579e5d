"""Second A/B round on the real chip: larger eval batches, phased vs dilated
deconv at decoder shapes, fused-GDN Pallas kernel timing."""

import time

import jax
import jax.numpy as jnp

from neural_image_compression_tpu.models import JointAutoregressiveHierarchical
from neural_image_compression_tpu.ops.conv import deconv2d, deconv2d_phased
from neural_image_compression_tpu.ops.pallas.gdn_kernel import fused_gdn
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
    print(f"{label:46s} {dt*1000:8.3f} ms", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)

    # --- deconv lowering A/B at the decoder's hottest shape ---------------
    x = jax.random.normal(key, (8, 128, 192, 128), jnp.bfloat16)
    w = jax.random.normal(key, (5, 5, 128, 128), jnp.bfloat16) * 0.05
    d_dil = jax.jit(lambda x, w: deconv2d(x, w, stride=2, padding=2, output_padding=1))
    d_pha = jax.jit(lambda x, w: deconv2d_phased(x, w, padding=2, output_padding=1))
    bench_fn(d_dil, (x, w), label="deconv5x5 s2 b8 128->256 dilated")
    bench_fn(d_pha, (x, w), label="deconv5x5 s2 b8 128->256 phased")
    diff = float(jnp.max(jnp.abs(d_dil(x, w).astype(jnp.float32) -
                                 d_pha(x, w).astype(jnp.float32))))
    print(f"  max|diff| = {diff:.3e}", flush=True)

    # --- GDN kernel vs XLA at a hot shape ----------------------------------
    xg = jax.random.normal(key, (8 * 128 * 192, 128), jnp.float32)
    gamma = 0.1 * jnp.eye(128)
    beta = jnp.ones(128)

    def gdn_xla(x, gamma, beta):
        norm = jnp.dot(x * x, gamma, preferred_element_type=jnp.float32) + beta
        return x * jax.lax.rsqrt(norm)

    bench_fn(jax.jit(gdn_xla), (xg, gamma, beta), label="GDN XLA (196k x 128)")
    bench_fn(jax.jit(lambda x, g, b: fused_gdn(x, g, b, block_n=512)),
             (xg, gamma, beta), label="GDN Pallas")

    # --- bigger eval batches ------------------------------------------------
    model = JointAutoregressiveHierarchical(latent_channels=M, K=K,
                                            dtype=jnp.bfloat16)
    x1 = jax.random.uniform(key, (1, 512, 768, 3), jnp.float32)
    params = jax.jit(lambda k, x: model.init(
        {"params": k, "noise": k}, x, training=False))(key, x1)["params"]

    @jax.jit
    def eval_step(params, x):
        out = model.apply({"params": params}, x, training=False)
        return rd_loss(out, x, 0.005)["bpp_total"]

    for b in (8, 12, 16, 24):
        xb = jax.random.uniform(key, (b, 512, 768, 3), jnp.float32)
        dt = bench_fn(eval_step, (params, xb), iters=16,
                      label=f"flagship eval fwd batch={b}")
        print(f"    -> {b/dt:8.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
