"""evaluation.health.curve_health — the RD-curve degenerate-point guard.

Both failure fixtures are real shipped-artifact shapes: the round-4
hyperprior λ=0.08 point (2.4× rate for −0.006 dB) and the round-5
channel_cb λ=0.08 replica (PSNR below its own λ=0.02 point).
"""

import numpy as np

from neural_image_compression_tpu.evaluation import curve_health


def _pt(lam, bpp, psnr):
    return {"lambda": lam, "bpp": bpp, "psnr": psnr}


HEALTHY = [_pt(0.001, 0.030, 36.84), _pt(0.005, 0.060, 40.67),
           _pt(0.02, 0.107, 43.66), _pt(0.08, 0.200, 46.24)]


def test_healthy_curve_passes():
    assert curve_health(HEALTHY) == []


def test_order_independent():
    assert curve_health(list(reversed(HEALTHY))) == []


def test_r4_hyperprior_rate_inefficiency_flagged():
    pts = [_pt(0.001, 0.08, 40.0), _pt(0.005, 0.2, 42.0),
           _pt(0.02, 0.524, 44.271), _pt(0.08, 1.247, 44.265)]
    warns = curve_health(pts)
    assert any("rate-inefficient" in w and "0.08" in w for w in warns)


def test_r5_channel_cb_nonmonotone_flagged():
    pts = [_pt(0.001, 0.037, 37.04), _pt(0.005, 0.067, 40.75),
           _pt(0.02, 0.108, 43.66), _pt(0.08, 0.228, 42.70)]
    warns = curve_health(pts)
    assert any("non-monotone" in w for w in warns)
    assert any("rate-inefficient" in w for w in warns)


def test_psnr_tolerance():
    # 0.03 dB dip is within the default 0.05 dB tolerance
    pts = [_pt(0.005, 0.06, 40.00), _pt(0.02, 0.10, 39.97)]
    assert curve_health(pts) == []
    assert curve_health(pts, psnr_tol_db=0.01) != []


def test_rate_factor_threshold():
    # 1.9x rate for 0.05 dB passes the default 2.0x gate, fails a 1.5x one
    pts = [_pt(0.005, 0.10, 42.0), _pt(0.02, 0.19, 42.05)]
    assert curve_health(pts) == []
    assert curve_health(pts, rate_factor=1.5) != []


def test_flat_curve_many_warnings():
    # totally saturated curve: every doubling is flagged
    pts = [_pt(l, b, 25.6) for l, b in
           ((0.001, 0.1), (0.005, 0.25), (0.02, 0.6), (0.08, 1.4))]
    warns = curve_health(pts)
    assert len(warns) >= 3


def test_numpy_float_inputs():
    pts = [{"lambda": np.float64(0.005), "bpp": np.float32(0.06),
            "psnr": np.float64(40.7)},
           {"lambda": np.float64(0.02), "bpp": np.float32(0.11),
            "psnr": np.float64(43.7)}]
    assert curve_health(pts) == []


def test_r5_bpp_nonmonotone_flagged():
    # the augmented channel_cb failure: λ=0.005 pays MORE bpp than λ=0.02
    # at 3 dB less PSNR — rate-dominated, invisible to the PSNR and
    # rate-factor checks
    pts = [_pt(0.005, 0.0969, 40.73), _pt(0.02, 0.0935, 43.95)]
    warns = curve_health(pts)
    assert any("bpp non-monotone" in w for w in warns)


def test_bpp_tolerance_2pct():
    # within-noise 1% inversion passes
    pts = [_pt(0.005, 0.100, 40.0), _pt(0.02, 0.099, 43.0)]
    assert curve_health(pts) == []
