"""BD-rate / BD-PSNR (evaluation/bdrate.py).

Validated against analytically-known deltas: a curve shifted by a constant
rate factor or a constant dB offset has a closed-form Bjøntegaard delta,
independent of the interpolation scheme.
"""

import numpy as np
import pytest

from neural_image_compression_tpu.evaluation.bdrate import bd_rate, bd_psnr

ANCHOR = [(0.1, 28.0), (0.2, 31.0), (0.4, 34.0), (0.8, 37.0)]


def _scale_rate(points, f):
    return [(r * f, d) for r, d in points]


def _shift_psnr(points, db):
    return [(r, d + db) for r, d in points]


class TestClosedForms:
    def test_identical_curves_are_zero(self):
        assert bd_rate(ANCHOR, ANCHOR) == pytest.approx(0.0, abs=1e-12)
        assert bd_psnr(ANCHOR, ANCHOR) == pytest.approx(0.0, abs=1e-12)

    def test_constant_rate_factor(self):
        # rate ×1.10 at every quality ⇒ log-rate gap is exactly ln(1.1)
        # everywhere ⇒ BD-rate = +10% regardless of curve shape.
        assert bd_rate(ANCHOR, _scale_rate(ANCHOR, 1.10)) == pytest.approx(10.0, rel=1e-9)
        assert bd_rate(ANCHOR, _scale_rate(ANCHOR, 0.80)) == pytest.approx(-20.0, rel=1e-9)

    def test_constant_psnr_offset(self):
        assert bd_psnr(ANCHOR, _shift_psnr(ANCHOR, 1.0)) == pytest.approx(1.0, abs=1e-9)
        assert bd_psnr(ANCHOR, _shift_psnr(ANCHOR, -0.5)) == pytest.approx(-0.5, abs=1e-9)

    def test_better_curve_signs(self):
        better = _scale_rate(ANCHOR, 0.9)
        assert bd_rate(ANCHOR, better) < 0
        assert bd_psnr(ANCHOR, better) > 0

    def test_direction_antisymmetry(self):
        test = _scale_rate(ANCHOR, 1.25)
        fwd = bd_rate(ANCHOR, test)
        rev = bd_rate(test, ANCHOR)
        # log-domain gaps negate exactly: (1+f)(1+r) == 1
        assert (1 + fwd / 100) * (1 + rev / 100) == pytest.approx(1.0, rel=1e-9)


class TestInterpolation:
    def test_pchip_matches_scipy(self):
        scipy_interp = pytest.importorskip("scipy.interpolate")
        from neural_image_compression_tpu.evaluation.bdrate import (
            _pchip_derivatives, _pchip_integral,
        )

        rng = np.random.default_rng(0)
        x = np.cumsum(rng.uniform(0.5, 2.0, 6))
        y = np.cumsum(rng.uniform(0.1, 3.0, 6))  # monotone, uneven
        p = scipy_interp.PchipInterpolator(x, y)
        np.testing.assert_allclose(_pchip_derivatives(x, y),
                                   p.derivative()(x), rtol=1e-12, atol=1e-12)
        lo, hi = x[0] + 0.3, x[-1] - 0.7  # partial end segments
        np.testing.assert_allclose(_pchip_integral(x, y, lo, hi),
                                   p.antiderivative()(hi) - p.antiderivative()(lo),
                                   rtol=1e-12)

    def test_dict_points_from_sweep(self):
        pts = [{"lambda": 0.001 * (i + 1), "bpp": r, "psnr": d, "msssim": 0.9}
               for i, (r, d) in enumerate(ANCHOR)]
        shifted = [dict(p, bpp=p["bpp"] * 1.1) for p in pts]
        assert bd_rate(pts, shifted) == pytest.approx(10.0, rel=1e-9)
        # alternate metric key
        pts_m = [dict(p, msssim=0.90 + 0.01 * i) for i, p in enumerate(pts)]
        sh_m = [dict(p, bpp=p["bpp"] * 1.1) for p in pts_m]
        assert bd_rate(pts_m, sh_m, metric="msssim") == pytest.approx(10.0, rel=1e-9)

    def test_unsorted_input_ok(self):
        assert bd_rate(ANCHOR[::-1], _scale_rate(ANCHOR, 1.1)[::-1]) == \
            pytest.approx(10.0, rel=1e-9)

    def test_partial_overlap_uses_intersection(self):
        # test curve covers only the top half of the anchor's quality range;
        # the constant-factor identity still holds on the overlap.
        test = _scale_rate(ANCHOR[1:], 1.1)
        assert bd_rate(ANCHOR, test) == pytest.approx(10.0, rel=1e-9)


class TestValidation:
    def test_no_overlap_raises(self):
        far = [(r, d + 100.0) for r, d in ANCHOR]
        with pytest.raises(ValueError, match="overlap"):
            bd_rate(ANCHOR, far)

    def test_too_few_points(self):
        with pytest.raises(ValueError, match=">= 2"):
            bd_rate(ANCHOR[:1], ANCHOR)

    def test_dominated_points_are_pruned(self):
        # real measured sweeps can have slightly inverted quality between
        # adjacent rate points; dominated points are dropped, not fatal
        noisy = [(0.1, 30.0), (0.2, 29.9), (0.4, 34.0)]
        clean = [(0.1, 30.0), (0.4, 34.0)]
        assert bd_rate(noisy, ANCHOR) == pytest.approx(
            bd_rate(clean, ANCHOR), rel=1e-12)
        # duplicate-rate points collapse to the better quality
        dup = [(0.1, 29.0), (0.1, 30.0), (0.4, 34.0)]
        assert bd_rate(dup, ANCHOR) == pytest.approx(
            bd_rate(clean, ANCHOR), rel=1e-12)

    def test_fully_non_monotone_raises(self):
        bad = [(0.1, 30.0), (0.2, 29.0), (0.4, 28.0)]
        with pytest.raises(ValueError, match="monotone"):
            bd_rate(bad, ANCHOR)

    def test_nonpositive_rate_raises(self):
        bad = [(0.0, 28.0), (0.2, 31.0)]
        with pytest.raises(ValueError, match="positive"):
            bd_rate(bad, ANCHOR)
