"""MS-SSIM/SSIM correctness: cross-checked against an independent
scipy-based implementation of the published algorithm."""

import jax.numpy as jnp
import numpy as np
import pytest

from neural_image_compression_tpu.evaluation import ms_ssim, rgb_to_luma, ssim


def _scipy_ssim_cs(x, y, data_range=1.0):
    """Independent single-scale SSIM (valid conv, 11-tap gaussian sigma 1.5)."""
    from scipy.ndimage import correlate1d

    win = np.arange(11) - 5.0
    g = np.exp(-win ** 2 / (2 * 1.5 ** 2))
    g /= g.sum()

    def blur(im):
        out = correlate1d(im, g, axis=0, mode="constant")
        out = correlate1d(out, g, axis=1, mode="constant")
        return out[5:-5, 5:-5]  # valid region

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_x, mu_y = blur(x), blur(y)
    sxx = blur(x * x) - mu_x ** 2
    syy = blur(y * y) - mu_y ** 2
    sxy = blur(x * y) - mu_x * mu_y
    cs = (2 * sxy + c2) / (sxx + syy + c2)
    s = ((2 * mu_x * mu_y + c1) / (mu_x ** 2 + mu_y ** 2 + c1)) * cs
    return s.mean(), cs.mean()


def test_ssim_identical_is_one():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32))
    assert abs(float(ssim(x, x)) - 1.0) < 1e-6


def test_ssim_matches_independent_implementation():
    rng = np.random.RandomState(1)
    x = rng.rand(48, 48).astype(np.float32)
    y = np.clip(x + 0.05 * rng.randn(48, 48).astype(np.float32), 0, 1)
    ours = float(ssim(jnp.asarray(x)[None, :, :, None], jnp.asarray(y)[None, :, :, None]))
    ref, _ = _scipy_ssim_cs(x, y)
    assert abs(ours - ref) < 1e-4


def test_ms_ssim_identical_is_one():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 192, 192, 3).astype(np.float32))
    assert abs(float(ms_ssim(x, x)) - 1.0) < 1e-5


def test_ms_ssim_decreases_with_noise():
    rng = np.random.RandomState(2)
    x = rng.rand(1, 192, 192, 3).astype(np.float32)
    small = np.clip(x + 0.01 * rng.randn(*x.shape).astype(np.float32), 0, 1)
    big = np.clip(x + 0.2 * rng.randn(*x.shape).astype(np.float32), 0, 1)
    v_small = float(ms_ssim(jnp.asarray(x), jnp.asarray(small)))
    v_big = float(ms_ssim(jnp.asarray(x), jnp.asarray(big)))
    assert 1.0 > v_small > v_big > 0.0


def test_ms_ssim_matches_manual_composition():
    """ms_ssim == prod(relu(cs_i)^w_i, i<4) * relu(ssim_4)^w_4 with 2x avg
    pooling between levels — verified against the scipy implementation."""
    rng = np.random.RandomState(3)
    x = rng.rand(256, 256).astype(np.float32)
    y = np.clip(x + 0.1 * rng.randn(256, 256).astype(np.float32), 0, 1)

    weights = [0.0448, 0.2856, 0.3001, 0.2363, 0.1333]
    xs, ys = x, y
    vals = []
    for i in range(5):
        s, cs = _scipy_ssim_cs(xs, ys)
        vals.append(max(s, 0.0) if i == 4 else max(cs, 0.0))
        if i < 4:
            xs = xs.reshape(xs.shape[0] // 2, 2, xs.shape[1] // 2, 2).mean(axis=(1, 3))
            ys = ys.reshape(ys.shape[0] // 2, 2, ys.shape[1] // 2, 2).mean(axis=(1, 3))
    expected = np.prod([v ** w for v, w in zip(vals, weights)])
    ours = float(ms_ssim(jnp.asarray(x)[None, :, :, None], jnp.asarray(y)[None, :, :, None]))
    assert abs(ours - expected) < 1e-3


def test_rgb_to_luma():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 3).astype(np.float32))
    y = rgb_to_luma(x)
    assert y.shape == (1, 8, 8, 1)
    expected = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    np.testing.assert_allclose(np.asarray(y[..., 0]), np.asarray(expected), rtol=1e-5)


def test_blur_convs_pin_highest_precision():
    """The Gaussian-blur convs must carry precision=HIGHEST: on TPU the
    default conv precision rounds inputs to bf16 on the MXU and the
    moment-form variance blur(x*x) - mu^2 cancels catastrophically on smooth
    content (measured MS-SSIM swung 0.99 -> 0.60..1.01 on the same tensors).
    CPU convs are true f32, so only the jaxpr can witness this here."""
    import jax
    from jax import lax

    x = jnp.zeros((1, 192, 192, 1), jnp.float32)
    jaxpr = jax.make_jaxpr(lambda a, b: ms_ssim(a, b))(x, x)

    def all_eqns(jx):
        for e in jx.eqns:
            yield e
            for v in e.params.values():
                inner = getattr(v, "jaxpr", None)
                if inner is not None:
                    yield from all_eqns(inner)

    convs = [e for e in all_eqns(jaxpr.jaxpr)
             if e.primitive.name == "conv_general_dilated"]
    assert convs, "expected conv_general_dilated eqns in ms_ssim"
    for e in convs:
        prec = e.params["precision"]
        assert prec in (lax.Precision.HIGHEST,
                        (lax.Precision.HIGHEST, lax.Precision.HIGHEST)), (
            f"blur conv precision {prec!r} is not HIGHEST")
