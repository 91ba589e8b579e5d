"""Causality tests for the masked (PixelCNN) context conv."""

import jax
import jax.numpy as jnp
import numpy as np

from neural_image_compression_tpu.ops import ContextModel, MaskedConv2d, causal_mask


def test_mask_pattern_type_a():
    """Mask A zeroes center-onward of middle row + all rows below
    (ContextModels.py:15-16)."""
    m = causal_mask(5, "A")[:, :, 0, 0]
    expected = np.array([
        [1, 1, 1, 1, 1],
        [1, 1, 1, 1, 1],
        [1, 1, 0, 0, 0],
        [0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0],
    ], np.float32)
    np.testing.assert_array_equal(m, expected)


def test_mask_pattern_type_b():
    m = causal_mask(3, "B")[:, :, 0, 0]
    expected = np.array([
        [1, 1, 1],
        [1, 1, 0],
        [0, 0, 0],
    ], np.float32)
    np.testing.assert_array_equal(m, expected)


def test_causality_by_jacobian():
    """Output at raster position p must not depend on inputs at positions >= p."""
    key = jax.random.PRNGKey(0)
    h = w = 6
    model = MaskedConv2d(features=2, kernel_size=5, mask_type="A")
    x = jax.random.normal(key, (1, h, w, 3))
    vs = model.init(key, x)

    def f(inp):
        return model.apply(vs, inp)

    jac = jax.jacobian(f)(x)  # (1,h,w,2, 1,h,w,3)
    jac = np.abs(np.asarray(jac))[0, :, :, :, 0]  # (h,w,2, h,w,3)
    for i in range(h):
        for j in range(w):
            dep = jac[i, j].sum(axis=(0, 3))  # (h, w) dependence map summed over channels
            # strictly-future positions in raster order (incl. self) must be zero
            future = np.zeros((h, w), bool)
            future[i, j:] = True
            future[i + 1:, :] = True
            assert dep[future].max() == 0.0, f"non-causal dependence at {(i, j)}"


def test_context_model_channels():
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 8, 8, 16))
    cm = ContextModel(latent_channels=16)
    vs = cm.init(key, x)
    out = cm.apply(vs, x)
    assert out.shape == (1, 8, 8, 32)  # 2*M (ContextModels.py:29)


def test_masking_is_functional_not_stateful():
    """The stored kernel keeps its masked-position values; only the applied
    kernel is masked (unlike ContextModels.py:19 which mutates weights)."""
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 4, 4, 2))
    m = MaskedConv2d(features=2, kernel_size=3)
    vs = m.init(key, x)
    kernel = vs["params"]["kernel"]
    # masked positions of the raw parameter should in general be nonzero
    assert np.abs(np.asarray(kernel[2, :, :, :])).max() > 0
