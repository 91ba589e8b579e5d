"""Export golden tensors from the reference implementation (run as an oracle,
never copied): fixed inputs + parameters + outputs for the factorized
bottleneck likelihood, Gaussian/GMM conditionals, and rd_loss, saved to
tests/golden/*.npz. Tests compare this framework's numerics against these
fixtures WITHOUT needing /root/reference at test time.

Run once in the build environment:  python tools/export_golden.py
"""

import os
import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference")

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden")
os.makedirs(OUT, exist_ok=True)


def export_factorized():
    from EntropyModels import FactorizedEntropyBottleneck

    torch.manual_seed(0)
    C = 8
    feb = FactorizedEntropyBottleneck(channels=C)
    rng = np.random.RandomState(1)
    x = rng.randn(2, C, 4, 4).astype(np.float32) * 4  # NCHW
    with torch.no_grad():
        lik = feb(torch.from_numpy(x)).numpy()
        xs = np.linspace(-12, 12, 101).astype(np.float32)
        ch_cdf = np.stack([feb.channel_cdf(c, torch.from_numpy(xs)).numpy()
                           for c in range(C)])
        ch_pmf = np.stack([feb.channel_pmf(c, torch.from_numpy(xs)).numpy()
                           for c in range(C)])
    params = {}
    for i in range(4):
        params[f"matrix_{i}"] = feb.matrices[i].detach().numpy()
        params[f"bias_{i}"] = feb.biases[i].detach().numpy()
        if i < 3:
            params[f"factor_{i}"] = feb.factors[i].detach().numpy()
    np.savez(os.path.join(OUT, "factorized_ref.npz"),
             x=x, likelihood=lik, xs=xs, channel_cdf=ch_cdf, channel_pmf=ch_pmf,
             **params)
    print("factorized:", lik.shape, "lik range", lik.min(), lik.max())


def export_gaussian():
    from EntropyModels import GaussianConditional, GaussianMixtureConditional

    rng = np.random.RandomState(2)
    B, M, H, W, K = 2, 4, 3, 3, 3
    x = np.round(rng.randn(B, M, H, W) * 3).astype(np.float32)
    mu = rng.randn(B, M, H, W).astype(np.float32)
    sigma = (np.abs(rng.randn(B, M, H, W)) + 0.3).astype(np.float32)
    gc = GaussianConditional()
    with torch.no_grad():
        p = gc(torch.from_numpy(x), mu=torch.from_numpy(mu),
               sigma=torch.from_numpy(sigma)).numpy()

    w = rng.rand(B, K, M, H, W).astype(np.float32)
    w /= w.sum(axis=1, keepdims=True)
    mus = rng.randn(B, K, M, H, W).astype(np.float32)
    sigmas = (np.abs(rng.randn(B, K, M, H, W)) + 0.3).astype(np.float32)
    gmm = GaussianMixtureConditional()
    with torch.no_grad():
        pm = gmm(torch.from_numpy(x), weights=torch.from_numpy(w),
                 mus=torch.from_numpy(mus), sigmas=torch.from_numpy(sigmas)).numpy()
    np.savez(os.path.join(OUT, "gaussian_ref.npz"),
             x=x, mu=mu, sigma=sigma, p=p, w=w, mus=mus, sigmas=sigmas, pm=pm)
    print("gaussian:", p.shape, "gmm:", pm.shape)


def export_rd_loss():
    from RateDistortionLoss import rd_loss

    rng = np.random.RandomState(3)
    B, H, W = 2, 32, 32
    out = {
        "x_hat": torch.from_numpy(rng.rand(B, 3, H, W).astype(np.float32)),
        "logp_y": torch.from_numpy(-rng.rand(B, 4, 2, 2).astype(np.float32)),
        "logp_z": torch.from_numpy(-rng.rand(B, 4, 1, 1).astype(np.float32)),
    }
    x = torch.from_numpy(rng.rand(B, 3, H, W).astype(np.float32))
    res = rd_loss(out, x, lambda_rd=0.01)
    np.savez(os.path.join(OUT, "rd_loss_ref.npz"),
             x_hat=out["x_hat"].numpy(), logp_y=out["logp_y"].numpy(),
             logp_z=out["logp_z"].numpy(), x=x.numpy(),
             loss=float(res["loss"]), bpp_y=res["bpp_y"], bpp_z=res["bpp_z"],
             bpp_total=res["bpp_total"], mse=res["mse"], psnr=res["psnr"],
             bits_total=res["bits_total"])
    print("rd_loss:", float(res["loss"]))


def export_context_ep():
    """Context model (masked 5x5 conv) + EntropyParameters net, K=1 and K=3
    (ContextModels.py:23-36, ParametersModels.py:8-64): verifies the full
    phi/psi -> entropy-parameter wiring incl. the GMM chunk/reshape order."""
    from ContextModels import ContextModel
    from ParametersModels import EntropyParameters

    torch.manual_seed(3)
    M = 8
    rng = np.random.RandomState(7)
    y = (rng.randn(2, M, 6, 7) * 3).astype(np.float32)
    ctx = ContextModel(latent_channels=M)
    with torch.no_grad():
        phi = ctx(torch.from_numpy(y)).numpy()
    data = {"y": y, "phi": phi,
            "ctx_w": ctx.masked.weight.detach().numpy(),
            "ctx_b": ctx.masked.bias.detach().numpy()}

    combined = rng.randn(2, 4 * M, 6, 7).astype(np.float32)
    data["combined"] = combined
    for K in (1, 3):
        ep = EntropyParameters(latent_channels=M, hyper_latent_channels=M, K=K)
        with torch.no_grad():
            outs = ep(torch.from_numpy(combined))
        for li, idx in enumerate((0, 2, 4)):
            data[f"ep{K}_w{li}"] = ep.net[idx].weight.detach().numpy()
            data[f"ep{K}_b{li}"] = ep.net[idx].bias.detach().numpy()
        if K == 1:
            data["ep1_mu"], data["ep1_sigma"] = [o.numpy() for o in outs]
        else:
            data["ep3_w"], data["ep3_mu"], data["ep3_sigma"] = [
                o.numpy() for o in outs]
    np.savez(os.path.join(OUT, "context_ep_ref.npz"), **data)
    print("context_ep: phi", phi.shape)



if __name__ == "__main__":
    export_factorized()
    export_gaussian()
    export_rd_loss()
    export_context_ep()
