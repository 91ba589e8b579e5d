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


def export_vision_rd_loss():
    """vision_rd_loss oracle (RateDistortionLoss.py:52-121) with the
    distillation term live: V is a seeded 1x1 conv (weights saved so the JAX
    test can reproduce it exactly), frozen_activation is SiLU."""
    from RateDistortionLoss import vision_rd_loss

    rng = np.random.RandomState(7)
    B, C, H, W = 2, 5, 16, 16
    out = {
        "x_hat": torch.from_numpy(rng.rand(B, 3, H, W).astype(np.float32)),
        "F_tilde": torch.from_numpy(rng.randn(B, C, H, W).astype(np.float32)),
        "logp_y1": torch.from_numpy(-rng.rand(B, 4, 2, 2).astype(np.float32)),
        "logp_y2": torch.from_numpy(-rng.rand(B, 3, 2, 2).astype(np.float32)),
        "logp_z": torch.from_numpy(-rng.rand(B, 4, 1, 1).astype(np.float32)),
    }
    x = torch.from_numpy(rng.rand(B, 3, H, W).astype(np.float32))
    V = torch.nn.Conv2d(3, C, 1)
    with torch.no_grad():
        V.weight.copy_(torch.from_numpy(rng.randn(C, 3, 1, 1).astype(np.float32)))
        V.bias.copy_(torch.from_numpy(rng.randn(C).astype(np.float32)))
    res = vision_rd_loss(out, x, lambda_rd=0.02, gamma=0.7,
                         frozen_activation=torch.nn.SiLU(), V=V)
    np.savez(os.path.join(OUT, "vision_rd_loss_ref.npz"),
             x=x.numpy(), V_w=V.weight.detach().numpy(),
             V_b=V.bias.detach().numpy(),
             **{k: v.numpy() for k, v in out.items()},
             loss=float(res["loss"]), bpp_y1=res["bpp_y1"],
             bpp_y2=res["bpp_y2"], bpp_y=res["bpp_y"], bpp_z=res["bpp_z"],
             bpp_total=res["bpp_total"], mse=res["mse"],
             reconstruction_mse=res["reconstruction_mse"], psnr=res["psnr"],
             vision_mse=float(res["vision_mse"]),
             mse_per_image=res["mse_per_image"].numpy(),
             bits_total=res["bits_total"])
    print("vision_rd_loss:", float(res["loss"]))


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



def _boundary_distance(t: "torch.Tensor") -> float:
    """Distance of the closest element to a round()-decision boundary."""
    frac = torch.abs(t - torch.round(t))
    return float(torch.min(torch.abs(frac - 0.5)))


def export_full_model():
    """End-to-end eval-forward oracle for the composed models (Models.py:49-105
    with the Components.py:6-122 transform chains and compressai-style GDN):
    seeded reference model -> full state_dict + eval forward on a fixed input.
    The JAX side maps the weights (utils/torch_import.py) and must reproduce
    x_hat / likelihoods / entropy params to f32 tolerance.

    GDN comes from tools/torch_oracles.py (compressai is not installed); it
    is an independent torch-autograd re-derivation of the same spec the JAX
    GDN implements, so this cross-checks the full transform chain.
    """
    import torch_oracles

    torch_oracles.install_as_compressai()
    from Models import HierarchicalMixtureResidual, JointAutoregressiveHierarchical

    rng = np.random.RandomState(11)
    x = rng.rand(1, 3, 64, 128).astype(np.float32)

    cases = [
        ("joint5x5_k1", JointAutoregressiveHierarchical, dict(latent_channels=16, K=1)),
        ("joint5x5_k3", JointAutoregressiveHierarchical, dict(latent_channels=16, K=3)),
        ("res3x3_k1", HierarchicalMixtureResidual, dict(latent_channels=16, K=1)),
    ]
    for name, cls, kwargs in cases:
        torch.manual_seed(42)
        model = cls(**kwargs).eval()
        with torch.no_grad():
            out = model(torch.from_numpy(x), training=False)
            # rounding is a discontinuity: if any latent sits on a .5 boundary
            # the two frameworks could legally round differently and the
            # fixture would be flaky — guard the margin.
            margin = min(_boundary_distance(out["y"]), _boundary_distance(out["z"]))
            assert margin > 1e-3, f"{name}: latent too close to rounding boundary ({margin})"
        data = {"x": x, "quantize_margin": margin}
        for k, v in out.items():
            if isinstance(v, torch.Tensor):
                data["out_" + k] = v.numpy()
        for k, v in model.state_dict().items():
            data["sd_" + k] = v.numpy()
        np.savez(os.path.join(OUT, f"fullmodel_{name}.npz"), **data)
        print(f"fullmodel {name}: margin={margin:.4f}, "
              f"x_hat range [{out['x_hat'].min():.3f}, {out['x_hat'].max():.3f}], "
              f"{len(model.state_dict())} tensors")


def export_scalable():
    """ScalableImageCoding oracle (Models.py:208-338). The committed forward
    is unrunnable (SURVEY §2.3-2: params2 never assigned, mu1/sigma1 kwarg
    mismatch, stray debug arg), and the committed LST config is also
    unrunnable (Models.py:256 + Components.py:130: `latent_channels *= 2`
    makes RB2 expect 2*M1 channels while URB1 outputs M1). This harness runs
    the reference's own MODULES in the evident-intent order with those
    defects fixed, using a runnable LST (upsampling_factors=[1,1,1,1]), and
    exports weights + outputs."""
    import torch_oracles

    torch_oracles.install_as_compressai()
    from Components import LatentSpaceTransform
    from Models import ScalableImageCoding

    rng = np.random.RandomState(19)
    x = torch.from_numpy(rng.rand(1, 3, 64, 128).astype(np.float32))

    for K in (1, 3):
        torch.manual_seed(44)
        model = ScalableImageCoding(latent_channels=16, base_channels=10, K=K).eval()
        model.LST = LatentSpaceTransform(latent_channels=10,
                                         upsampling_factors=[1, 1, 1, 1]).eval()
        with torch.no_grad():
            # evident-intent forward using the reference's submodules
            y = model.encoder(x)
            z = model.hyper_encoder(y)
            margin = min(_boundary_distance(y), _boundary_distance(z))
            assert margin > 1e-3, f"scalable K={K}: rounding margin {margin}"
            y_q, z_q = torch.round(y), torch.round(z)
            y1, y2 = torch.split(y_q, [model.M1, model.M2], dim=1)
            psi = model.hyper_decoder(z_q)
            phi1 = model.context_model_1(y1)
            phi2 = model.context_model_2(y2)
            c1 = torch.cat([phi1, psi], dim=1)
            c2 = torch.cat([phi2, psi], dim=1)
            out = {"y": y, "z": z, "y_in": y_q, "z_in": z_q, "y1": y1, "y2": y2}
            if K == 1:
                mu1, sigma1 = model.entropy_parameters_1(c1)
                mu2, sigma2 = model.entropy_parameters_2(c2)
                out.update(mu1=mu1, sigma1=sigma1, mu2=mu2, sigma2=sigma2)
                out["p_y1"] = model.conditional(y1, mu=mu1, sigma=sigma1)
                out["p_y2"] = model.conditional(y2, mu=mu2, sigma=sigma2)
            else:
                w1, mus1, sig1 = model.entropy_parameters_1(c1)
                w2, mus2, sig2 = model.entropy_parameters_2(c2)
                out.update(weights1=w1, mus1=mus1, sigmas1=sig1,
                           weights2=w2, mus2=mus2, sigmas2=sig2)
                out["p_y1"] = model.conditional(y1, weights=w1, mus=mus1, sigmas=sig1)
                out["p_y2"] = model.conditional(y2, weights=w2, mus=mus2, sigmas=sig2)
            out["p_z"] = model.factorized_entropy_model(z_q)
            out["x_hat"] = model.decoder(y_q)
            out["F_tilde"] = model.LST(y1)
        data = {"x": x.numpy(), "quantize_margin": margin}
        for k, v in out.items():
            data["out_" + k] = v.numpy()
        for k, v in model.state_dict().items():
            data["sd_" + k] = v.numpy()
        np.savez(os.path.join(OUT, f"fullmodel_scalable_k{K}.npz"), **data)
        print(f"fullmodel scalable K={K}: margin={margin:.4f}, "
              f"{len(model.state_dict())} tensors")


def export_msssim():
    """MS-SSIM oracle values (pytorch_msssim 0.2.1 semantics re-derived in
    tools/torch_oracles.py) on a compression-like pair: a smooth image vs a
    noisy/blurred distortion, plus an odd-size pair exercising the avg-pool
    padding path."""
    import torch_oracles

    rng = np.random.RandomState(13)
    cases = {}
    # smooth base + mild noise (typical codec distortion regime)
    base = rng.rand(1, 3, 8, 8).astype(np.float32)
    big = torch.nn.functional.interpolate(torch.from_numpy(base), size=(192, 256),
                                          mode="bicubic", align_corners=False)
    big = torch.clamp(big, 0, 1)
    noisy = torch.clamp(big + torch.from_numpy(
        rng.normal(0, 0.03, big.shape).astype(np.float32)), 0, 1)
    cases["pair0"] = (big, noisy)
    # odd spatial size (avg-pool pad path), 1-channel (luma path)
    base = rng.rand(1, 1, 8, 8).astype(np.float32)
    big = torch.nn.functional.interpolate(torch.from_numpy(base), size=(171, 177),
                                          mode="bicubic", align_corners=False)
    big = torch.clamp(big, 0, 1)
    noisy = torch.clamp(big + torch.from_numpy(
        rng.normal(0, 0.08, big.shape).astype(np.float32)), 0, 1)
    cases["pair1"] = (big, noisy)

    data = {}
    for name, (a, b) in cases.items():
        val = float(torch_oracles.ms_ssim(a, b, data_range=1.0))
        data[name + "_a"] = a.numpy()
        data[name + "_b"] = b.numpy()
        data[name + "_msssim"] = val
        print(f"msssim {name}: {val:.6f}")
    np.savez(os.path.join(OUT, "msssim_ref.npz"), **data)


def export_gdn():
    """GDN/IGDN forward + gradients with NON-identity gamma (VERDICT weak #6:
    round-1 tests only covered the closed-form init point). Parameters are
    perturbed off init; gradients are taken w.r.t. input AND raw (reparam)
    beta/gamma so the LowerBound straight-through path is checked too."""
    import torch_oracles

    rng = np.random.RandomState(17)
    C = 6
    data = {}
    for inverse in (False, True):
        tag = "igdn" if inverse else "gdn"
        torch.manual_seed(5)
        gdn = torch_oracles.GDN(C, inverse=inverse)
        with torch.no_grad():
            # perturb: non-identity gamma incl. negatives (exercises the bound),
            # varied beta
            gdn.gamma += torch.from_numpy(
                rng.normal(0, 0.05, (C, C)).astype(np.float32))
            gdn.beta += torch.from_numpy(
                rng.normal(0, 0.2, (C,)).astype(np.float32))
        x = torch.from_numpy(rng.normal(0, 2, (2, C, 5, 7)).astype(np.float32))
        x.requires_grad_(True)
        y = gdn(x)
        cot = rng.rand(*y.shape).astype(np.float32)  # cotangent for the VJP
        (y * torch.from_numpy(cot)).sum().backward()
        data[f"{tag}_x"] = x.detach().numpy()
        data[f"{tag}_beta_raw"] = gdn.beta.detach().numpy()
        data[f"{tag}_gamma_raw"] = gdn.gamma.detach().numpy()
        data[f"{tag}_y"] = y.detach().numpy()
        data[f"{tag}_cotangent"] = cot
        data[f"{tag}_grad_x"] = x.grad.numpy()
        data[f"{tag}_grad_beta"] = gdn.beta.grad.numpy()
        data[f"{tag}_grad_gamma"] = gdn.gamma.grad.numpy()
        print(f"{tag}: y range [{float(y.min()):.3f}, {float(y.max()):.3f}]")
    np.savez(os.path.join(OUT, "gdn_ref.npz"), **data)


if __name__ == "__main__":
    export_factorized()
    export_gaussian()
    export_rd_loss()
    export_vision_rd_loss()
    export_context_ep()
    export_full_model()
    export_scalable()
    export_msssim()
    export_gdn()
