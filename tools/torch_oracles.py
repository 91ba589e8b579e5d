"""Torch re-derivations of the reference's two external dependencies, used
ONLY to generate golden fixtures (never imported by the framework):

* GDN with compressai's exact parametrization. The reference imports
  `compressai.layers.gdn.GDN` (Layers.py:3, Components.py:2), which is not
  installed here; this module re-derives its published semantics — the
  sqrt+pedestal non-negative reparametrization (reparam_offset=2^-18) with a
  straight-through LowerBound — in torch autograd, giving an implementation
  of the same spec that is INDEPENDENT of the JAX one in ops/gdn.py +
  ops/bound.py. `install_as_compressai()` registers it under the
  `compressai.layers.gdn` module path so /root/reference models import it
  transparently when run as oracles.

* MS-SSIM with pytorch_msssim-0.2.1 semantics (the reference's metric,
  Evaluator.py:7,38): 11-tap Gaussian (sigma 1.5) separable valid-padding
  filter, K=(0.01, 0.03), level weights (0.0448, 0.2856, 0.3001, 0.2363,
  0.1333), ReLU-clamped contrast terms, 2x avg-pool with odd-size padding
  between levels. Independent of evaluation/msssim.py (JAX).
"""

import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F

REPARAM_OFFSET = 2.0 ** -18
PEDESTAL = REPARAM_OFFSET ** 2


class _LowerBoundFn(torch.autograd.Function):
    """max(x, bound); gradient passes iff x >= bound or it pushes x back up."""

    @staticmethod
    def forward(ctx, x, bound):
        ctx.save_for_backward(x)
        ctx.bound = bound
        return torch.clamp_min(x, bound)

    @staticmethod
    def backward(ctx, grad):
        (x,) = ctx.saved_tensors
        keep = (x >= ctx.bound) | (grad < 0)
        return grad * keep.to(grad.dtype), None


def lower_bound(x, bound):
    return _LowerBoundFn.apply(x, float(bound))


def nonneg_init(value):
    return torch.sqrt(torch.clamp(value + PEDESTAL, min=PEDESTAL))


def nonneg(raw, minimum=0.0):
    bound = (minimum + PEDESTAL) ** 0.5
    out = lower_bound(raw, bound)
    return out * out - PEDESTAL


class GDN(nn.Module):
    """y_i = x_i / sqrt(beta_i + sum_j gamma_ij x_j^2); inverse multiplies.

    Parameter storage and clamping follow compressai's NonNegativeParametrizer
    (see module docstring); init beta=1, gamma=gamma_init*I.
    """

    def __init__(self, in_channels, inverse: bool = False,
                 beta_min: float = 1e-6, gamma_init: float = 0.1):
        super().__init__()
        self.inverse = inverse
        self.beta_min = beta_min
        self.beta = nn.Parameter(nonneg_init(torch.ones(in_channels)))
        self.gamma = nn.Parameter(
            nonneg_init(gamma_init * torch.eye(in_channels)))

    def forward(self, x):
        c = x.size(1)
        beta = nonneg(self.beta, minimum=self.beta_min)
        gamma = nonneg(self.gamma).reshape(c, c, 1, 1)
        norm = F.conv2d(x * x, gamma, beta)
        norm = torch.sqrt(norm) if self.inverse else torch.rsqrt(norm)
        return x * norm


def install_as_compressai():
    """Register this GDN under `compressai.layers.gdn` so the reference's
    `from compressai.layers.gdn import GDN` resolves to the oracle."""
    gdn_mod = types.ModuleType("compressai.layers.gdn")
    gdn_mod.GDN = GDN
    layers_mod = types.ModuleType("compressai.layers")
    layers_mod.gdn = gdn_mod
    root_mod = types.ModuleType("compressai")
    root_mod.layers = layers_mod
    sys.modules.setdefault("compressai", root_mod)
    sys.modules["compressai.layers"] = layers_mod
    sys.modules["compressai.layers.gdn"] = gdn_mod


# ---------------------------------------------------------------------------
# MS-SSIM (pytorch_msssim 0.2.1 semantics), NCHW float tensors
# ---------------------------------------------------------------------------

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gauss_window(size=11, sigma=1.5):
    coords = torch.arange(size, dtype=torch.float32) - size // 2
    g = torch.exp(-(coords ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).reshape(1, 1, 1, size)


def _gaussian_filter(x, win):
    c = x.size(1)
    x = F.conv2d(x, win.expand(c, 1, 1, -1), groups=c)
    return F.conv2d(x, win.transpose(2, 3).expand(c, 1, -1, 1), groups=c)


def _ssim_per_channel(x, y, win, data_range, k=(0.01, 0.03)):
    c1 = (k[0] * data_range) ** 2
    c2 = (k[1] * data_range) ** 2
    mu1 = _gaussian_filter(x, win)
    mu2 = _gaussian_filter(y, win)
    s11 = _gaussian_filter(x * x, win) - mu1 * mu1
    s22 = _gaussian_filter(y * y, win) - mu2 * mu2
    s12 = _gaussian_filter(x * y, win) - mu1 * mu2
    cs_map = (2 * s12 + c2) / (s11 + s22 + c2)
    ssim_map = ((2 * mu1 * mu2 + c1) / (mu1 * mu1 + mu2 * mu2 + c1)) * cs_map
    return ssim_map.flatten(2).mean(-1), cs_map.flatten(2).mean(-1)


def ms_ssim(x, y, data_range=1.0, win_size=11, win_sigma=1.5,
            weights=_MSSSIM_WEIGHTS):
    win = _gauss_window(win_size, win_sigma)
    w = torch.tensor(weights, dtype=torch.float32)
    mcs = []
    ssim_val = None
    for level in range(len(weights)):
        ssim_val, cs = _ssim_per_channel(x, y, win, data_range)
        if level < len(weights) - 1:
            mcs.append(torch.relu(cs))
            pad = [s % 2 for s in x.shape[2:]]
            x = F.avg_pool2d(x, kernel_size=2, padding=pad)
            y = F.avg_pool2d(y, kernel_size=2, padding=pad)
    stack = torch.stack(mcs + [torch.relu(ssim_val)], dim=0)
    return torch.prod(stack ** w.view(-1, 1, 1), dim=0).mean()
