"""SSIM / MS-SSIM in JAX (NHWC), matching the algorithm the reference uses
via `pytorch_msssim.ms_ssim` (Evaluator.py:7,38,45): Wang et al. 2003
multi-scale SSIM with an 11-tap Gaussian window (sigma 1.5), K1=0.01,
K2=0.03, level weights (0.0448, 0.2856, 0.3001, 0.2363, 0.1333), valid
convolution, 2x average-pool (zero-padded to even size) between levels, and
ReLU-clamped per-level contrast terms.

TPU mapping: the Gaussian blur is two depthwise 1-D convs
(`feature_group_count=C`) which XLA fuses and tiles; everything is float32.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_DEFAULT_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    return g / jnp.sum(g)


def _blur(x: jax.Array, window: jax.Array) -> jax.Array:
    """Separable depthwise Gaussian blur, VALID padding. x: (B, H, W, C).

    precision=HIGHEST is load-bearing: on TPU the default conv precision
    rounds inputs to bf16 on the MXU, and the moment-form variance
    blur(x*x) - mu^2 then cancels catastrophically on smooth content
    (window variance ~1e-4 vs bf16 product error ~1e-3) — measured MS-SSIM
    swung from 0.99 to 0.60..1.01 on the same tensors. CPU convs are true
    f32, so the golden-parity tests (which run on CPU) cannot see this;
    HIGHEST restores f32-accurate convs on TPU (3-pass bf16 decomposition).
    """
    c = x.shape[-1]
    n = window.shape[0]
    kh = jnp.tile(window.reshape(n, 1, 1, 1), (1, 1, 1, c))   # (n,1,1,C) HWIO depthwise
    kw = jnp.tile(window.reshape(1, n, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=dn, feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                     dimension_numbers=dn, feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    return x


def _ssim_per_channel(x, y, window, data_range, k1=0.01, k2=0.03):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _blur(x, window)
    mu_y = _blur(y, window)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = _blur(x * x, window) - mu_xx
    sigma_yy = _blur(y * y, window) - mu_yy
    sigma_xy = _blur(x * y, window) - mu_xy
    cs_map = (2.0 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim_map = ((2.0 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs_map
    # mean over spatial -> (B, C)
    return ssim_map.mean(axis=(1, 2)), cs_map.mean(axis=(1, 2))


def _avg_pool2(x: jax.Array) -> jax.Array:
    """2x2 stride-2 average pool with zero pad to even size (pads count in
    the average — torch avg_pool2d count_include_pad=True semantics)."""
    _, h, w, _ = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return s / 4.0


@partial(jax.jit, static_argnames=("data_range", "size_average", "win_size"))
def ssim(x: jax.Array, y: jax.Array, data_range: float = 1.0,
         size_average: bool = True, win_size: int = 11,
         win_sigma: float = 1.5) -> jax.Array:
    """Single-scale SSIM over NHWC images."""
    window = _gaussian_window(win_size, win_sigma)
    s, _ = _ssim_per_channel(x.astype(jnp.float32), y.astype(jnp.float32),
                             window, data_range)
    return s.mean() if size_average else s.mean(axis=1)


@partial(jax.jit, static_argnames=("data_range", "size_average", "win_size", "weights"))
def ms_ssim(x: jax.Array, y: jax.Array, data_range: float = 1.0,
            size_average: bool = True, win_size: int = 11, win_sigma: float = 1.5,
            weights: Tuple[float, ...] = _DEFAULT_WEIGHTS) -> jax.Array:
    """Multi-scale SSIM over NHWC images (pytorch-msssim compatible)."""
    min_side = min(x.shape[1], x.shape[2])
    needed = (win_size - 1) * 2 ** (len(weights) - 1) + 1
    if min_side < needed:
        raise ValueError(
            f"ms_ssim with {len(weights)} levels and win_size={win_size} needs "
            f"images of at least {needed}px per side, got {min_side}")
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    window = _gaussian_window(win_size, win_sigma)
    w = jnp.asarray(weights, jnp.float32)
    levels = len(weights)

    mcs = []
    ssim_val = None
    for i in range(levels):
        ssim_val, cs = _ssim_per_channel(x, y, window, data_range)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs))
            x = _avg_pool2(x)
            y = _avg_pool2(y)
    ssim_val = jax.nn.relu(ssim_val)  # (B, C)
    mcs_and_ssim = jnp.stack(mcs + [ssim_val], axis=0)  # (L, B, C)
    out = jnp.prod(mcs_and_ssim ** w[:, None, None], axis=0)  # (B, C)
    return out.mean() if size_average else out.mean(axis=1)


def rgb_to_luma(x: jax.Array) -> jax.Array:
    """BT.601 luma from NHWC RGB in [0,1] -> (B, H, W, 1) (Evaluator.py:27-30)."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    return (0.299 * r + 0.587 * g + 0.114 * b)[..., None]
