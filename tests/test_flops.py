"""Analytic FLOP model sanity (utils/flops.py): scaling laws and magnitude."""

import pytest

from neural_image_compression_tpu.utils.flops import (
    PEAK_BF16_TFLOPS, factorized_prior_eval_flops, hyperprior_eval_flops,
    joint_ar_eval_flops, mfu, scalable_eval_flops, train_step_flops,
)


def test_joint_ar_magnitude_and_breakdown():
    f = joint_ar_eval_flops(128, 3, 512, 768)
    # flagship eval forward is ~75 GFLOP/img; encoder and decoder dominate
    assert 5e10 < f["total"] < 1.2e11
    assert f["encoder"] == f["decoder"] - 0  # symmetric 5x5 mirror
    assert f["encoder"] > 10 * f["hyper_encoder"]
    assert f["total"] == sum(v for k, v in f.items() if k != "total")


def test_scales_linearly_with_pixels():
    a = joint_ar_eval_flops(64, 1, 256, 256)["total"]
    b = joint_ar_eval_flops(64, 1, 256, 512)["total"]
    assert abs(b / a - 2.0) < 0.01


def test_scales_quadratically_with_channels():
    a = joint_ar_eval_flops(64, 1, 256, 256)["encoder"]
    b = joint_ar_eval_flops(128, 1, 256, 256)["encoder"]
    assert 3.5 < b / a < 4.05  # M^2 terms dominate (3->M first layer is linear)


def test_variants():
    assert joint_ar_eval_flops(64, 1, 256, 256, "res3x3")["total"] > 0
    assert factorized_prior_eval_flops(128, 512, 768)["total"] > 0
    s = scalable_eval_flops(192, 128, 3, 512, 768)
    assert s["lst"] > 0
    assert s["total"] == sum(v for k, v in s.items() if k != "total")


def test_hyperprior_is_joint_minus_context_and_half_ep_input():
    j = joint_ar_eval_flops(128, 3, 512, 768)
    h = hyperprior_eval_flops(128, 3, 512, 768)
    assert "context" not in h
    # EP saving = the first GEMM's halved input width (4M -> 2M)
    ep_delta = j["entropy_parameters"] - h["entropy_parameters"]
    h16w16 = (512 // 16) * (768 // 16)
    assert ep_delta == 2 * h16w16 * 2 * 128 * 640
    assert h["total"] == j["total"] - j["context"] - ep_delta
    assert h["total"] == sum(v for k, v in h.items() if k != "total")


def test_channel_cb_breakdown():
    from neural_image_compression_tpu.utils.flops import channel_cb_eval_flops

    j = joint_ar_eval_flops(128, 3, 512, 768)
    c = channel_cb_eval_flops(128, 3, 512, 768)
    assert "context" not in c and c["spatial_ctx"] > 0 and c["channel_ctx"] > 0
    # transforms identical; only the context/EP stage differs
    for k in ("encoder", "decoder", "hyper_encoder", "hyper_decoder"):
        assert c[k] == j[k]
    # per-group spatial convs are strictly cheaper than one full M->2M conv
    # (sum of g_i^2 < M^2 for any non-trivial split)
    assert c["spatial_ctx"] < j["context"]
    assert c["total"] == sum(v for k, v in c.items() if k != "total")
    # custom groups change the context stage only
    c2 = channel_cb_eval_flops(128, 3, 512, 768, groups=(64, 64))
    assert c2["total"] != c["total"]
    assert c2["encoder"] == c["encoder"]


def test_mfu_and_train():
    f = joint_ar_eval_flops(128, 3, 512, 768)["total"]
    u = mfu(1000.0, f, PEAK_BF16_TFLOPS["v5e"])
    assert 0.3 < u < 0.5
    assert train_step_flops(f) == 3 * f
