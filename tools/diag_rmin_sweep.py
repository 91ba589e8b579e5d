"""Sweep the coder's minimum alphabet span R_MIN on the converged
hyperprior checkpoint (numpy replica of build_gaussian_model) to pick a
window-floor that kills the escape overhead without paying floor mass.
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


def load(family, model_cls, kw):
    from neural_image_compression_tpu.data import ImageFolderDataset

    with open(f"/tmp/nic_rd_ladder/{family}_0.005.pkl", "rb") as f:
        params = jax.tree.map(jnp.asarray, pickle.load(f))
    model = model_cls(latent_channels=128, K=3, dtype=jnp.bfloat16, **kw)
    return model, {"params": params}


def price(sym, mus, sigmas, weights, r_min, npix):
    if weights is None:
        weights = np.ones_like(mus)[..., None]
        mus, sigmas = mus[..., None], sigmas[..., None]
    mus, sigmas, weights = (a.astype(np.float64) for a in
                            (mus, sigmas, weights))
    mean = (weights * mus).sum(-1)
    m2 = (weights * (sigmas**2 + mus**2)).sum(-1)
    stdd = np.sqrt(np.maximum(m2 - mean**2, 1e-12))
    c = np.rint(mean).astype(np.int64)
    R = np.clip(np.ceil(6.0 * stdd).astype(np.int64) + 2, r_min, 254)
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
    mass_in = np.clip(mix_cdf((c + R) + 0.5) - mix_cdf((c - R) - 0.5), 0, 1)
    esc = np.clip(1.0 - mass_in, 0.0, None)
    total = np.clip(mass_in + esc, 1e-30, None)
    scale = (S - nsym).astype(np.float64) / total
    bits_in = -np.log2((1.0 + np.floor(p_d * scale)) / S)
    bits_esc = -np.log2((1.0 + np.floor(esc * scale)) / S) + 32.0
    coder_bits = np.where(inwin, bits_in, bits_esc)
    return coder_bits.sum() / npix, int((~inwin).sum())


def main():
    from neural_image_compression_tpu.coding.codec import (
        CheckerboardCodec,
        MeanScaleHyperpriorCodec,
    )
    from neural_image_compression_tpu.data import ImageFolderDataset
    from neural_image_compression_tpu.models import (
        CheckerboardHierarchical,
        MeanScaleHyperprior,
    )

    val = ImageFolderDataset("/tmp/nic_scale/data/val", cache=True)
    x = np.asarray(val[0])[None]
    npix = x.shape[1] * x.shape[2]

    # hyperprior rows
    model, variables = load("hyperprior", MeanScaleHyperprior, {})
    codec = MeanScaleHyperpriorCodec(model, variables)
    outs = codec._analysis_q(variables, jnp.asarray(x))
    sym = np.asarray(outs[0])[0].astype(np.int32).reshape(-1)
    mus, sigmas, weights = codec._coder_rows(
        codec._params_prog(variables, outs[1]))
    print("hyperprior y stream (analytic 1.04193, current coder 1.11875):",
          flush=True)
    for r_min in (2, 4, 8, 12, 16, 24, 32, 48):
        bpp, nesc = price(sym, mus, sigmas, weights, r_min, npix)
        print(f"  R_MIN {r_min:3d}: {bpp:.5f} bpp, escapes {nesc}",
          flush=True)

    # context families: price with the eval-forward entropy params (equal to
    # the encode-side coder params — encoder knows y everywhere)
    from neural_image_compression_tpu.models import (
        JointAutoregressiveHierarchical,
    )
    from neural_image_compression_tpu.train.loss import rd_loss

    for family, cls in (("checkerboard", CheckerboardHierarchical),
                        ("joint_ar", JointAutoregressiveHierarchical)):
        model, variables = load(family, cls, {})
        out = jax.jit(lambda v, x, mdl=model: mdl.apply(
            v, x, training=False))(variables, jnp.asarray(x))
        m = rd_loss(out, jnp.asarray(x), 0.005)
        sym = np.asarray(out["y_in"])[0].astype(np.int32).reshape(-1)
        w = np.asarray(out["weights"], np.float32)[0]
        mu = np.asarray(out["mus"], np.float32)[0]
        sg = np.asarray(out["sigmas"], np.float32)[0]
        # (h, w, K, M) -> (h*w*M, K) channel fastest to match sym order
        def rows(a):
            f = a.reshape(-1, a.shape[-2], a.shape[-1])  # (n, K, M)
            return np.swapaxes(f, 1, 2).reshape(-1, a.shape[-2])
        mu, sg, w = rows(mu), rows(sg), rows(w)
        print(f"{family} y stream (analytic bpp_y "
              f"{float(m['bpp_y']):.5f}):", flush=True)
        for r_min in (2, 8, 16, 32):
            bpp, nesc = price(sym, mu, sg, w, r_min, npix)
            print(f"  R_MIN {r_min:3d}: {bpp:.5f} bpp, escapes {nesc}",
                  flush=True)


if __name__ == "__main__":
    main()
