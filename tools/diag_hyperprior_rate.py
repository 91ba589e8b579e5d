"""Diagnose the hyperprior codec's measured-vs-analytic rate gap.

rd_ladder.json measured the converged hyperprior stream at +6.5% over
analytic while every other family lands at or below analytic. This splits
the gap per stream (z vs y), per symbol, and against the sigma/weight
distribution to find where the extra bits go.

CPU-only (loads the ladder checkpoint from /tmp/nic_rd_ladder).
"""

import os
import pickle
import struct
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from neural_image_compression_tpu.coding.codec import (
        MeanScaleHyperpriorCodec,
    )
    from neural_image_compression_tpu.data import ImageFolderDataset
    from neural_image_compression_tpu.models import MeanScaleHyperprior
    from neural_image_compression_tpu.train.loss import rd_loss

    with open("/tmp/nic_rd_ladder/hyperprior_0.005.pkl", "rb") as f:
        params = jax.tree.map(jnp.asarray, pickle.load(f))
    model = MeanScaleHyperprior(latent_channels=128, K=3, dtype=jnp.bfloat16)
    variables = {"params": params}

    val = ImageFolderDataset("/tmp/nic_scale/data/val", cache=True)
    x = np.asarray(val[0])[None]
    print("image", x.shape, flush=True)

    out = jax.jit(lambda v, x: model.apply(v, x, training=False))(
        variables, jnp.asarray(x))
    m = rd_loss(out, jnp.asarray(x), 0.005)
    npix = x.shape[1] * x.shape[2]
    print(f"analytic: bpp_total {float(m['bpp_total']):.5f} "
          f"bpp_y {float(m['bpp_y']):.5f} bpp_z {float(m['bpp_z']):.5f}",
          flush=True)

    codec = MeanScaleHyperpriorCodec(model, variables)
    data = codec.compress(x)
    fmt = "<4sBBHHHHhhII"
    hs = struct.calcsize(fmt)
    (_, _, K, M, img_h, img_w, _, zmin, zmax, len_z, len_y) = struct.unpack(
        fmt, data[:hs])
    print(f"measured: total {len(data) * 8 / npix:.5f} bpp "
          f"(y {len_y * 8 / npix:.5f}, z {len_z * 8 / npix:.5f}, "
          f"header {hs * 8 / npix:.5f}); zmin {zmin} zmax {zmax}", flush=True)

    # recompute the coder-side rows to inspect the distribution
    outs = codec._analysis_q(variables, jnp.asarray(x))
    y_q = np.asarray(outs[0])[0]
    z_q = np.asarray(outs[1])[0]
    rows_t = codec._params_prog(variables, outs[1])
    mus, sigmas, weights = codec._coder_rows(rows_t)
    sym = y_q.astype(np.int32).reshape(-1)
    print(f"y symbols: n {sym.size}, range [{sym.min()}, {sym.max()}]",
          flush=True)
    for q in (0, 1, 10, 50, 90, 99, 100):
        print(f"  sigma p{q:3d}: {np.percentile(sigmas, q):.4f}", flush=True)
    if weights is not None:
        print(f"  weights min {weights.min():.5f} max {weights.max():.5f}",
              flush=True)

    # exact analytic bits for the y stream from the coder's own f32 rows
    # (GMM over K), to separate model-vs-coder effects, plus the per-symbol
    # overhead histogram of measured-CDF cost vs analytic cost.
    from jax.scipy.special import erf

    def pmf(v):
        v = jnp.asarray(v, jnp.float32)
        if weights is None:
            mu, sg = jnp.asarray(mus), jnp.asarray(sigmas)
            up = erf((v + 0.5 - mu) / (sg * np.sqrt(2.0)))
            lo = erf((v - 0.5 - mu) / (sg * np.sqrt(2.0)))
            return (up - lo) * 0.5
        mu, sg, w = (jnp.asarray(a) for a in (mus, sigmas, weights))
        up = erf((v[:, None] + 0.5 - mu) / (sg * np.sqrt(2.0)))
        lo = erf((v[:, None] - 0.5 - mu) / (sg * np.sqrt(2.0)))
        return jnp.sum(w * (up - lo) * 0.5, axis=-1)

    p = np.asarray(jax.jit(pmf)(sym))
    p = np.maximum(p, 1e-9)
    bits = -np.log2(p)
    print(f"coder-row analytic y bits: {bits.sum() / npix:.5f} bpp "
          f"(model analytic bpp_y above should match)", flush=True)

    # now the coder's actual quantized-CDF cost: rebuild the exact CDF the
    # native coder uses per symbol and price each symbol at its quantized
    # probability. Mirrors backend's table build (R<=254 alphabet around
    # the symbol range, 16-bit totals).
    from neural_image_compression_tpu.coding import backend
    print("backend CDF pricing helpers:",
          [n for n in dir(backend) if "cdf" in n.lower()][:10], flush=True)



if __name__ == "__main__":
    main()
