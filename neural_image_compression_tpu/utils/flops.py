"""Analytic FLOP models for the compression networks.

Counts multiply-accumulates x2 for every conv/deconv/GDN-matmul on the
eval-forward path, per image, so benchmarks can report MFU (model FLOP
utilization = achieved FLOP/s over the chip's peak) instead of only img/s.
Elementwise work (activations, quantization, likelihood CDFs) is a few
FLOPs per element against ~1e4 MAC-FLOPs per element and rides the VPU, not
the MXU; it is summarized in a single 'elementwise' estimate and does not
meaningfully move MFU.

Conventions: deconv FLOPs are counted as input_pixels * k^2 * Cin * Cout * 2
(each input pixel contributes to k^2 outputs) — this is what the MXU
executes for the lhs-dilated formulation; masked convs count full taps (the
dense conv computes the zeros).

TPU peak references (bf16, per chip): v5e 197 TFLOP/s, v4 275, v5p 459.
"""

from typing import Dict

PEAK_BF16_TFLOPS = {"v4": 275.0, "v5e": 197.0, "v5p": 459.0}


def _conv(out_h: int, out_w: int, k: int, cin: int, cout: int) -> int:
    return 2 * out_h * out_w * k * k * cin * cout


def _deconv(in_h: int, in_w: int, k: int, cin: int, cout: int) -> int:
    return 2 * in_h * in_w * k * k * cin * cout


def _gdn(h: int, w: int, c: int) -> int:
    return 2 * h * w * c * c  # the (BHW, C) x (C, C) norm matmul


def _res_block(h: int, w: int, cin: int, cout: int, stride: int = 1,
               gdn: bool = False, skip: bool = None) -> int:
    oh, ow = h // stride, w // stride
    f = _conv(oh, ow, 3, cin, cout) + _conv(oh, ow, 3, cout, cout)
    if gdn:
        f += _gdn(oh, ow, cout)
    if skip is None:
        skip = stride != 1 or cin != cout
    if skip:
        f += _conv(oh, ow, 1, cin, cout)
    return f


def _res_block_up(h: int, w: int, c: int, up: int = 2) -> int:
    # TransposedDeconv3x3 main + conv + IGDN + TransposedDeconv3x3 skip
    oh, ow = h * up, w * up
    return (2 * _deconv(h, w, 3, c, c) + _conv(oh, ow, 3, c, c)
            + _gdn(oh, ow, c))


def joint_ar_eval_flops(M: int, K: int, H: int, W: int,
                        transform: str = "conv5x5") -> Dict[str, int]:
    """Per-image eval-forward FLOPs of JointAutoregressiveHierarchical
    (Models.py:49-105 structure), by component. H, W: image size (multiples
    of 64)."""
    h16, w16 = H // 16, W // 16
    h64, w64 = H // 64, W // 64
    out = {}
    if transform == "conv5x5":
        out["encoder"] = (
            _conv(H // 2, W // 2, 5, 3, M) + _gdn(H // 2, W // 2, M)
            + _conv(H // 4, W // 4, 5, M, M) + _gdn(H // 4, W // 4, M)
            + _conv(H // 8, W // 8, 5, M, M) + _gdn(H // 8, W // 8, M)
            + _conv(h16, w16, 5, M, M))
        out["decoder"] = (
            _deconv(h16, w16, 5, M, M) + _gdn(H // 8, W // 8, M)
            + _deconv(H // 8, W // 8, 5, M, M) + _gdn(H // 4, W // 4, M)
            + _deconv(H // 4, W // 4, 5, M, M) + _gdn(H // 2, W // 2, M)
            + _deconv(H // 2, W // 2, 5, M, 3))
        out["hyper_encoder"] = (
            _conv(h16, w16, 3, M, M) + _conv(H // 32, W // 32, 5, M, M)
            + _conv(h64, w64, 5, M, M))
        out["hyper_decoder"] = (
            _deconv(h64, w64, 5, M, M)
            + _deconv(H // 32, W // 32, 5, M, int(1.5 * M))
            + _conv(h16, w16, 3, int(1.5 * M), 2 * M))
    elif transform == "res3x3":
        out["encoder"] = sum((
            _res_block(H // (2 ** i), W // (2 ** i), 3 if i == 0 else M, M,
                       stride=2, gdn=True)
            + _res_block(H // (2 ** (i + 1)), W // (2 ** (i + 1)), M, M)
            for i in range(3))) + _conv(h16, w16, 3, M, M)
        out["decoder"] = sum((
            _res_block(H // (2 ** (4 - i)), W // (2 ** (4 - i)), M, M)
            + _res_block_up(H // (2 ** (4 - i)), W // (2 ** (4 - i)), M)
            for i in range(3))) + _res_block(H // 2, W // 2, M, M) \
            + _deconv(H // 2, W // 2, 3, M, 3)
        out["hyper_encoder"] = (
            2 * _conv(h16, w16, 3, M, M) + _conv(H // 32, W // 32, 3, M, M)
            + _conv(H // 32, W // 32, 3, M, M) + _conv(h64, w64, 3, M, M))
        m15 = int(1.5 * M)
        out["hyper_decoder"] = (
            _conv(h64, w64, 3, M, M) + _deconv(h64, w64, 3, M, M)
            + _conv(H // 32, W // 32, 3, M, m15)
            + _deconv(H // 32, W // 32, 3, m15, m15)
            + _conv(h16, w16, 3, m15, 2 * M))
    else:
        raise ValueError(transform)
    out["context"] = _conv(h16, w16, 5, M, 2 * M)
    ep_out = 2 * M if K == 1 else 3 * K * M
    out["entropy_parameters"] = (
        _conv(h16, w16, 1, 4 * M, 640) + _conv(h16, w16, 1, 640, 640)
        + _conv(h16, w16, 1, 640, ep_out))
    # likelihood CDFs + quantization + misc, ~100 FLOPs per latent per
    # component — VPU work, kept for honesty in the total
    out["elementwise"] = 100 * (h16 * w16 * M * K + h64 * w64 * M)
    out["total"] = sum(out.values())
    return out


def hyperprior_eval_flops(M: int, K: int, H: int, W: int,
                          transform: str = "conv5x5") -> Dict[str, int]:
    """Per-image eval-forward FLOPs of MeanScaleHyperprior: the joint-AR
    structure minus the context conv, with the EP net contracting over 2M
    input lanes (psi only) instead of the 4M context+hyper concat.
    (CheckerboardHierarchical matches joint_ar_eval_flops exactly — its
    context conv has the same shape.)"""
    out = dict(joint_ar_eval_flops(M, K, H, W, transform))
    h16, w16 = H // 16, W // 16
    del out["context"]
    ep_out = 2 * M if K == 1 else 3 * K * M
    out["entropy_parameters"] = (
        _conv(h16, w16, 1, 2 * M, 640) + _conv(h16, w16, 1, 640, 640)
        + _conv(h16, w16, 1, 640, ep_out))
    out["total"] = sum(v for k, v in out.items() if k != "total")
    return out


def channel_cb_eval_flops(M: int, K: int, H: int, W: int,
                          groups=None,
                          transform: str = "conv5x5") -> Dict[str, int]:
    """Per-image eval-forward FLOPs of ChannelCheckerboardHierarchical: the
    joint-AR transforms with the single context conv + EP net replaced by
    per-group spatial-context convs, channel-context stacks, and EP nets
    (models/channel_cb.py)."""
    from neural_image_compression_tpu.models.channel_cb import default_groups

    g = tuple(groups) if groups is not None else default_groups(M)
    out = dict(joint_ar_eval_flops(M, K, H, W, transform))
    h16, w16 = H // 16, W // 16
    del out["context"]
    spatial = channel = ep = 0
    off = 0
    for i, gi in enumerate(g):
        spatial += _conv(h16, w16, 5, gi, 2 * gi)
        if i > 0:
            hidden = max(2 * gi, 64)
            channel += (_conv(h16, w16, 5, off, hidden)
                        + _conv(h16, w16, 5, hidden, 2 * gi))
        ep_out = 2 * gi if K == 1 else 3 * K * gi
        ep += (_conv(h16, w16, 1, 4 * gi + 2 * M, 640)
               + _conv(h16, w16, 1, 640, 640)
               + _conv(h16, w16, 1, 640, ep_out))
        off += gi
    out["spatial_ctx"] = spatial
    out["channel_ctx"] = channel
    out["entropy_parameters"] = ep
    out["total"] = sum(v for k, v in out.items() if k != "total")
    return out


def factorized_prior_eval_flops(M: int, H: int, W: int) -> Dict[str, int]:
    out = {}
    out["encoder"] = (
        _conv(H // 2, W // 2, 5, 3, M) + _gdn(H // 2, W // 2, M)
        + _conv(H // 4, W // 4, 5, M, M) + _gdn(H // 4, W // 4, M)
        + _conv(H // 8, W // 8, 5, M, M) + _gdn(H // 8, W // 8, M)
        + _conv(H // 16, W // 16, 5, M, M))
    out["decoder"] = (
        _deconv(H // 16, W // 16, 5, M, M) + _gdn(H // 8, W // 8, M)
        + _deconv(H // 8, W // 8, 5, M, M) + _gdn(H // 4, W // 4, M)
        + _deconv(H // 4, W // 4, 5, M, M) + _gdn(H // 2, W // 2, M)
        + _deconv(H // 2, W // 2, 5, M, 3))
    out["elementwise"] = 100 * (H // 16) * (W // 16) * M
    out["total"] = sum(out.values())
    return out


def scalable_eval_flops(M: int, M1: int, K: int, H: int, W: int,
                        lst_upsampling=(2, 1, 1, 1)) -> Dict[str, int]:
    base = joint_ar_eval_flops(M, K, H, W, "conv5x5")
    h16, w16 = H // 16, W // 16
    M2 = M - M1
    out = {k: base[k] for k in ("encoder", "decoder", "hyper_encoder",
                                "hyper_decoder")}
    out["context"] = _conv(h16, w16, 5, M1, 2 * M1) + _conv(h16, w16, 5, M2, 2 * M2)
    out["entropy_parameters"] = 0
    for m in (M1, M2):
        ep_out = 2 * m if K == 1 else 3 * K * m
        out["entropy_parameters"] += (
            _conv(h16, w16, 1, 2 * m + 2 * M, 640)
            + _conv(h16, w16, 1, 640, 640) + _conv(h16, w16, 1, 640, ep_out))
    # LST tower on y1 — mirror components.py:166-175 exactly: the block
    # width m multiplies by u AFTER each upsample stage, so later stages run
    # at m = M1 * prod(ups[:i]) channels (2*M1 for the default schedule);
    # the stage RB bridges the previous stage's channels c into m via its
    # 1x1 skip, and the final conv maps m -> m * ups[3].
    h, w, c = h16, w16, M1
    m = M1
    lst = 0
    for u in lst_upsampling[:3]:
        lst += _res_block(h, w, c, m)
        lst += _res_block_up(h, w, m, u)
        h, w, c = h * u, w * u, m
        m *= u
    lst += _res_block(h, w, c, m) + _conv(h, w, 3, m, m * lst_upsampling[3])
    out["lst"] = lst
    out["elementwise"] = 100 * (h16 * w16 * M * K + (H // 64) * (W // 64) * M)
    out["total"] = sum(out.values())
    return out


def train_step_flops(eval_total: int) -> int:
    """Fwd + bwd approximation: backward is ~2x forward for conv nets."""
    return 3 * eval_total


def mfu(images_per_sec: float, flops_per_image: int,
        peak_tflops: float = PEAK_BF16_TFLOPS["v5e"]) -> float:
    return images_per_sec * flops_per_image / (peak_tflops * 1e12)
