"""Unit tests for the ops layer: bounds, convs (torch golden parity), GDN."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_image_compression_tpu.ops import (
    GDN, conv2d, deconv2d, lower_bound, nonneg, nonneg_init, pixel_shuffle,
)
from neural_image_compression_tpu.ops.bound import PEDESTAL


class TestLowerBound:
    def test_forward(self):
        x = jnp.array([-1.0, 0.5, 2.0])
        np.testing.assert_allclose(lower_bound(x, 1.0), [1.0, 1.0, 2.0])

    def test_grad_passthrough_above(self):
        g = jax.grad(lambda x: lower_bound(x, 1.0).sum())(jnp.array([2.0]))
        assert g[0] == 1.0

    def test_grad_blocked_below_when_pushing_down(self):
        # below bound, positive cotangent (loss decreases by decreasing x) -> blocked
        g = jax.grad(lambda x: lower_bound(x, 1.0).sum())(jnp.array([0.5]))
        assert g[0] == 0.0

    def test_grad_passes_below_when_pushing_up(self):
        # below bound, negative cotangent (step would increase x) -> passes
        g = jax.grad(lambda x: -lower_bound(x, 1.0).sum())(jnp.array([0.5]))
        assert g[0] == -1.0

    def test_nonneg_roundtrip(self):
        v = jnp.array([0.1, 1.0, 5.0])
        np.testing.assert_allclose(nonneg(nonneg_init(v)), v, rtol=1e-5, atol=1e-7)

    def test_nonneg_respects_minimum(self):
        raw = jnp.array([-10.0, 0.0])  # way below the bound
        out = nonneg(raw, minimum=1e-6)
        assert np.all(np.asarray(out) >= 1e-6 - 1e-12)


class TestConvTorchParity:
    """Golden parity of NHWC conv/deconv geometry against torch (CPU)."""

    def _torch(self):
        torch = pytest.importorskip("torch")
        return torch

    def test_conv2d_matches_torch(self):
        torch = self._torch()
        rng = np.random.RandomState(0)
        x = rng.randn(2, 11, 13, 4).astype(np.float32)
        w = rng.randn(5, 5, 4, 6).astype(np.float32)  # HWIO
        b = rng.randn(6).astype(np.float32)
        ours = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                 stride=2, padding=2))
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        wt = torch.from_numpy(w.transpose(3, 2, 0, 1))  # OIHW
        ref = torch.nn.functional.conv2d(xt, wt, torch.from_numpy(b), stride=2, padding=2)
        np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("k,s,p,op", [(5, 2, 2, 1), (3, 2, 1, 1), (3, 1, 1, 0)])
    def test_deconv2d_matches_torch(self, k, s, p, op):
        torch = self._torch()
        rng = np.random.RandomState(1)
        x = rng.randn(2, 7, 9, 4).astype(np.float32)
        w = rng.randn(k, k, 4, 6).astype(np.float32)  # HWIO, direct-conv orientation
        ours = np.asarray(deconv2d(jnp.asarray(x), jnp.asarray(w),
                                   stride=s, padding=p, output_padding=op))
        # torch ConvTranspose2d weight is (I, O, kh, kw) and correlates; the
        # equivalent direct-conv kernel is ours flipped spatially:
        wt = torch.from_numpy(w[::-1, ::-1].transpose(2, 3, 0, 1).copy())
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        ref = torch.nn.functional.conv_transpose2d(
            xt, wt, stride=s, padding=p, output_padding=op)
        np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-4)

    def test_deconv_output_geometry(self):
        # torch formula: out = (in-1)*s - 2p + k + op  (Layers.py:18-24 usage)
        x = jnp.zeros((1, 8, 8, 2))
        w = jnp.zeros((5, 5, 2, 3))
        out = deconv2d(x, w, stride=2, padding=2, output_padding=1)
        assert out.shape == (1, 16, 16, 3)

    def test_pixel_shuffle_matches_torch(self):
        torch = self._torch()
        rng = np.random.RandomState(2)
        x = rng.randn(2, 3, 4, 8).astype(np.float32)  # NHWC, C = 2 * 2^2
        ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        ref = torch.nn.functional.pixel_shuffle(xt, 2)
        np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-5, atol=1e-6)


class TestGDN:
    def _apply(self, x, inverse=False):
        m = GDN(inverse=inverse)
        vs = m.init(jax.random.PRNGKey(0), x)
        return m, vs, m.apply(vs, x)

    def test_forward_matches_closed_form_at_init(self, rng):
        """At init beta=1, gamma=0.1*I  =>  y = x / sqrt(1 + 0.1 x^2)."""
        x = jax.random.normal(rng, (2, 4, 4, 8))
        _, _, out = self._apply(x)
        expected = x / jnp.sqrt(1.0 + 0.1 * x * x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                                   rtol=1e-4, atol=1e-5)

    def test_inverse_matches_closed_form_at_init(self, rng):
        x = jax.random.normal(rng, (2, 4, 4, 8))
        _, _, out = self._apply(x, inverse=True)
        expected = x * jnp.sqrt(1.0 + 0.1 * x * x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                                   rtol=1e-4, atol=1e-5)

    def test_igdn_inverts_gdn_at_init(self, rng):
        """With identical params, IGDN(GDN(x)) != x in general, but at the
        diagonal init the pair is an exact analytic inverse."""
        x = jax.random.normal(rng, (1, 4, 4, 4))
        y = x / jnp.sqrt(1.0 + 0.1 * x * x)
        # IGDN at init: y * sqrt(1 + 0.1 y^2) — NOT x. Instead check the true
        # inverse relation: given y, x = y / sqrt(1 - 0.1 y^2).
        x_rec = y / jnp.sqrt(1.0 - 0.1 * y * y)
        np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-4, atol=1e-5)

    def test_gradients_finite(self, rng):
        x = jax.random.normal(rng, (2, 4, 4, 8))
        m = GDN()
        vs = m.init(rng, x)

        def loss(vs, x):
            return jnp.sum(m.apply(vs, x) ** 2)

        g = jax.grad(loss)(vs, x)
        for leaf in jax.tree.leaves(g):
            assert np.all(np.isfinite(np.asarray(leaf)))

    def test_beta_gamma_shapes(self, rng):
        x = jnp.ones((1, 2, 2, 16))
        m = GDN()
        vs = m.init(rng, x)
        assert vs["params"]["beta"].shape == (16,)
        assert vs["params"]["gamma"].shape == (16, 16)


class TestPhasedDeconv:
    @pytest.mark.parametrize("k,p", [(5, 2), (3, 1)])
    def test_matches_dilated(self, k, p):
        from neural_image_compression_tpu.ops.conv import deconv2d_phased

        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.randn(2, 6, 9, 4).astype(np.float32))
        w = jnp.asarray(rng.randn(k, k, 4, 5).astype(np.float32))
        b = jnp.asarray(rng.randn(5).astype(np.float32))
        ref = deconv2d(x, w, b, stride=2, padding=p, output_padding=1)
        got = deconv2d_phased(x, w, b, padding=p, output_padding=1)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


class TestDeconvLowerings:
    """deconv2d_subpel is a different lowering of the same operator: results
    must match deconv2d to f32 tolerance for every geometry the models use,
    forward AND gradient."""

    @pytest.mark.parametrize("k,p", [(5, 2), (3, 1)])
    @pytest.mark.parametrize("cin,cout", [(8, 8), (16, 3)])
    def test_matches_dilated(self, k, p, cin, cout):
        from neural_image_compression_tpu.ops.conv import deconv2d, deconv2d_subpel

        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, 6, 9, cin))
        ker = jax.random.normal(jax.random.PRNGKey(1), (k, k, cin, cout)) * 0.1
        b = jax.random.normal(jax.random.PRNGKey(2), (cout,))

        def f_dil(x, ker, b):
            return deconv2d(x, ker, b, stride=2, padding=p, output_padding=1)

        def f_sub(x, ker, b):
            return deconv2d_subpel(x, ker, b, padding=p, output_padding=1)

        a, b1 = f_dil(x, ker, b), f_sub(x, ker, b)
        np.testing.assert_allclose(a, b1, atol=1e-5)
        # gradients through both lowerings agree
        cot = jax.random.normal(jax.random.PRNGKey(3), a.shape)
        g1 = jax.grad(lambda *args: jnp.sum(f_dil(*args) * cot),
                      argnums=(0, 1, 2))(x, ker, b)
        g2 = jax.grad(lambda *args: jnp.sum(f_sub(*args) * cot),
                      argnums=(0, 1, 2))(x, ker, b)
        for u, v in zip(g1, g2):
            np.testing.assert_allclose(u, v, atol=1e-4)

    def test_auto_heuristic(self):
        from neural_image_compression_tpu.ops.conv import _deconv_lowering_auto

        # tiny cout -> subpel at any batch (MXU lane utilization)
        assert _deconv_lowering_auto(1, 256, 384, 3) == "subpel"
        assert _deconv_lowering_auto(48, 256, 384, 3) == "subpel"
        # small grid needs batch to pay off
        assert _deconv_lowering_auto(48, 32, 48, 128) == "subpel"
        assert _deconv_lowering_auto(1, 32, 48, 128) == "dilated"
        # big many-channel grids stay dilated
        assert _deconv_lowering_auto(48, 128, 192, 128) == "dilated"

    def test_module_override(self):
        from neural_image_compression_tpu.ops.conv import Deconv2d

        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (1, 4, 4, 8))
        m1 = Deconv2d(8, 5, 2, 2, 1, lowering="dilated")
        m2 = Deconv2d(8, 5, 2, 2, 1, lowering="subpel")
        p = m1.init(key, x)["params"]
        np.testing.assert_allclose(m1.apply({"params": p}, x),
                                   m2.apply({"params": p}, x), atol=1e-5)


class TestConvCustomDx:
    """conv2d's custom-VJP twin (subpel input-grad) must be a pure lowering
    change: identical forward, identical gradients (f32 tolerance) vs the
    stock XLA transpose rule, for every stride-2 geometry the encoders use."""

    @pytest.mark.parametrize("k,p", [(5, 2), (3, 1)])
    @pytest.mark.parametrize("cin,cout", [(8, 16), (3, 8)])
    def test_grads_match_stock_rule(self, k, p, cin, cout, monkeypatch):
        from neural_image_compression_tpu.ops import conv as C

        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (4, 16, 24, cin))
        w = jax.random.normal(jax.random.PRNGKey(1), (k, k, cin, cout)) * 0.1
        b = jax.random.normal(jax.random.PRNGKey(2), (cout,))
        cot = jax.random.normal(jax.random.PRNGKey(3), (4, 8, 12, cout))

        def run(mode):
            monkeypatch.setenv("NIC_CONV_DX", mode)

            def f(x, w, b):
                return jnp.sum(C.conv2d(x, w, b, 2, p) * cot)

            out = C.conv2d(x, w, b, 2, p)
            return out, jax.grad(f, argnums=(0, 1, 2))(x, w, b)

        out_c, g_c = run("subpel")
        out_s, g_s = run("dilated")
        np.testing.assert_array_equal(np.asarray(out_c), np.asarray(out_s))
        for u, v in zip(g_c, g_s):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       rtol=1e-4, atol=1e-5)

    def test_odd_grids_take_plain_path(self, monkeypatch):
        # odd H/W can't express dx as an op=1 deconv; the router must fall
        # back to the stock rule even when forced
        from neural_image_compression_tpu.ops import conv as C

        monkeypatch.setenv("NIC_CONV_DX", "subpel")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 15, 15, 4))
        w = jax.random.normal(jax.random.PRNGKey(1), (5, 5, 4, 8)) * 0.1
        g = jax.grad(lambda x: C.conv2d(x, w, None, 2, 2).sum())(x)
        assert g.shape == x.shape and bool(jnp.isfinite(g).all())


class TestConvPatchesDw:
    """conv2d's patches-GEMM kernel-grad (NIC_CONV_DW) must be a pure
    lowering change: identical forward, identical gradients (f32 tolerance)
    vs XLA's stock ConvBackpropFilter, for the geometries the transforms
    use, including the lane-underfilled 3->M boundary conv it targets."""

    @pytest.mark.parametrize("k,s,p", [(5, 2, 2), (3, 1, 1), (5, 1, 2)])
    @pytest.mark.parametrize("cin,cout", [(3, 16), (8, 16)])
    def test_grads_match_stock_rule(self, k, s, p, cin, cout, monkeypatch):
        from neural_image_compression_tpu.ops import conv as C

        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (4, 16, 24, cin))
        w = jax.random.normal(jax.random.PRNGKey(1), (k, k, cin, cout)) * 0.1
        b = jax.random.normal(jax.random.PRNGKey(2), (cout,))
        ho, wo = (16 + 2 * p - k) // s + 1, (24 + 2 * p - k) // s + 1
        cot = jax.random.normal(jax.random.PRNGKey(3), (4, ho, wo, cout))

        def run(mode):
            if mode is None:
                monkeypatch.delenv("NIC_CONV_DW", raising=False)
            else:
                monkeypatch.setenv("NIC_CONV_DW", mode)

            def f(x, w, b):
                return jnp.sum(C.conv2d(x, w, b, s, p) * cot)

            out = C.conv2d(x, w, b, s, p)
            return out, jax.grad(f, argnums=(0, 1, 2))(x, w, b)

        out_c, g_c = run("patches")
        out_s, g_s = run(None)
        np.testing.assert_array_equal(np.asarray(out_c), np.asarray(out_s))
        for u, v in zip(g_c, g_s):
            # f32 tolerance only: the patches einsum reduces in a different
            # summation order than ConvBackpropFilter
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       rtol=1e-4, atol=1e-4)

    def test_auto_mode_targets_small_cin_only(self, monkeypatch):
        from neural_image_compression_tpu.ops import conv as C

        monkeypatch.setenv("NIC_CONV_DW", "auto")
        # cin=3 <= 16: custom path; cin=32 > 16: stock path. Both must be
        # finite and correctly shaped either way (routing is a pure
        # lowering choice).
        for cin in (3, 32):
            x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, cin))
            w = jax.random.normal(jax.random.PRNGKey(1), (5, 5, cin, 8)) * 0.1
            g = jax.grad(lambda w: C.conv2d(x, w, None, 2, 2).sum())(w)
            assert g.shape == w.shape and bool(jnp.isfinite(g).all())
