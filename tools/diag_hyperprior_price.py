"""Price each hyperprior y symbol under a numpy replica of the native
coder's build_gaussian_model (rans_core.h) and decompose the measured
+7.4% y-stream overhead vs analytic.

CPU-only; reuses the ladder checkpoint.
"""

import os
import pickle
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.scipy.special import erf


def main():
    from neural_image_compression_tpu.coding.codec import (
        MeanScaleHyperpriorCodec,
    )
    from neural_image_compression_tpu.data import ImageFolderDataset
    from neural_image_compression_tpu.models import MeanScaleHyperprior

    with open("/tmp/nic_rd_ladder/hyperprior_0.005.pkl", "rb") as f:
        params = jax.tree.map(jnp.asarray, pickle.load(f))
    model = MeanScaleHyperprior(latent_channels=128, K=3, dtype=jnp.bfloat16)
    variables = {"params": params}
    codec = MeanScaleHyperpriorCodec(model, variables)

    val = ImageFolderDataset("/tmp/nic_scale/data/val", cache=True)
    x = np.asarray(val[0])[None]
    npix = x.shape[1] * x.shape[2]

    outs = codec._analysis_q(variables, jnp.asarray(x))
    y_q = np.asarray(outs[0])[0]
    rows_t = codec._params_prog(variables, outs[1])
    mus, sigmas, weights = codec._coder_rows(rows_t)
    sym = y_q.astype(np.int32).reshape(-1)
    K = codec.K
    if weights is None:
        weights = np.ones_like(mus)[..., None]
        mus, sigmas = mus[..., None], sigmas[..., None]

    mus = mus.astype(np.float64)
    sigmas = sigmas.astype(np.float64)
    weights = weights.astype(np.float64)

    mean = (weights * mus).sum(-1)
    m2 = (weights * (sigmas**2 + mus**2)).sum(-1)
    var = np.maximum(m2 - mean**2, 1e-12)
    stdd = np.sqrt(var)
    c = np.rint(mean).astype(np.int64)
    R = np.clip(np.ceil(6.0 * stdd).astype(np.int64) + 2, 2, 254)
    nsym = 2 * R + 2
    S = 65536

    d = sym.astype(np.int64) - c
    inwin = np.abs(d) <= R

    def mix_cdf(v):
        z = (v[:, None] - mus) / (sigmas * np.sqrt(2.0))
        return (weights * 0.5 * (1.0 + np.asarray(erf(jnp.asarray(z))))
                ).sum(-1)

    v = (c + d).astype(np.float64)
    p_d = np.clip(mix_cdf(v + 0.5) - mix_cdf(v - 0.5), 0.0, None)
    mass_in = np.clip(mix_cdf((c + R) + 0.5) - mix_cdf((c - R) - 0.5),
                      0.0, 1.0)
    esc = np.clip(1.0 - mass_in, 0.0, None)
    total = np.clip(mass_in + esc, 1e-30, None)

    budget = (S - nsym).astype(np.float64)
    scale = budget / total
    freq_d = 1.0 + np.floor(p_d * scale)
    freq_esc = 1.0 + np.floor(esc * scale)

    bits_in = -np.log2(freq_d / S)
    bits_esc = -np.log2(freq_esc / S) + 32.0
    coder_bits = np.where(inwin, bits_in, bits_esc)

    p_true = np.maximum(p_d, 1e-9)
    analytic_bits = -np.log2(p_true)

    print(f"replica coder y bpp: {coder_bits.sum() / npix:.5f} "
          f"(measured 1.11875)  analytic {analytic_bits.sum() / npix:.5f}",
          flush=True)
    print(f"escapes: {int((~inwin).sum())}", flush=True)

    over = coder_bits - analytic_bits
    print(f"total overhead: {over.sum() / npix:.5f} bpp", flush=True)
    # decompose by sigma-of-symbol and by where the overhead concentrates
    order = np.argsort(over)[::-1]
    top = order[:10]
    for i in top:
        print(f"  sym {sym[i]:4d} c {c[i]:4d} R {R[i]:3d} std {stdd[i]:.4f} "
              f"p_d {p_d[i]:.3e} coder {coder_bits[i]:6.2f} "
              f"analytic {analytic_bits[i]:6.2f}", flush=True)
    # bucket overhead by R
    for lo, hi in ((2, 4), (5, 16), (17, 64), (65, 254)):
        msk = (R >= lo) & (R <= hi)
        print(f"  R in [{lo:3d},{hi:3d}]: n {int(msk.sum()):7d} "
              f"overhead {over[msk].sum() / npix:+.5f} bpp "
              f"(coder {coder_bits[msk].sum() / npix:.5f}, "
              f"analytic {analytic_bits[msk].sum() / npix:.5f})", flush=True)


if __name__ == "__main__":
    main()
