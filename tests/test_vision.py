"""Backbone-splitting tests: FirstHalf ∘ SecondHalf == full backbone."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from neural_image_compression_tpu.models.vision import (
    FirstHalf, FrozenActivationBlock, GraphBackbone, SecondHalf,
)
from neural_image_compression_tpu.ops import Conv2d

KEY = jax.random.PRNGKey(0)


def _backbone():
    # small YOLO-ish graph: conv, conv, conv, concat(0, 2) -> conv
    return GraphBackbone(layers=(
        (Conv2d(8, 3, 1, 1), -1),
        (Conv2d(8, 3, 2, 1), -1),
        (Conv2d(8, 3, 1, 1), -1),
        (Conv2d(4, 1, 1, 0), [1, 2]),
    ))


def test_graph_backbone_runs():
    bb = _backbone()
    x = jax.random.normal(KEY, (1, 16, 16, 3))
    vs = bb.init(KEY, x)
    out = bb.apply(vs, x)
    assert out.shape == (1, 8, 8, 4)


def test_split_composition_matches_full():
    bb = _backbone()
    x = jax.random.normal(KEY, (1, 16, 16, 3))
    vs = bb.init(KEY, x)
    full = bb.apply(vs, x)
    nested = {"params": {"backbone": vs["params"]}}
    for cut in (0, 1, 2):
        fh = FirstHalf(backbone=bb, cut=cut)
        sh = SecondHalf(backbone=bb, cut=cut)
        mid, outs = fh.apply(nested, x, collect=True)
        # prev_outputs needed when later layers reference pre-cut outputs
        rec = sh.apply(nested, mid, prev_outputs=outs)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(full),
                                   rtol=1e-5, atol=1e-6)


def test_frozen_activation_block():
    c = 6
    rng = np.random.RandomState(0)
    blk = FrozenActivationBlock.from_stats(
        scale=rng.rand(c) + 0.5, bias=rng.randn(c),
        mean=rng.randn(c), var=rng.rand(c) + 0.1)
    x = jnp.asarray(rng.randn(1, 4, 4, c).astype(np.float32))
    out = blk(x)  # no params to init — pure function
    norm = (np.asarray(x) - blk.mean) / np.sqrt(blk.var + blk.eps) * blk.scale + blk.bias
    expected = norm / (1 + np.exp(-norm)) * 1.0  # silu = x*sigmoid(x)
    expected = norm * (1 / (1 + np.exp(-norm)))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_frozen_block_has_no_trainable_params():
    blk = FrozenActivationBlock.from_stats(
        scale=np.ones(3), bias=np.zeros(3), mean=np.zeros(3), var=np.ones(3))
    vs = blk.init(KEY, jnp.ones((1, 2, 2, 3)))
    assert vs == {} or jax.tree.leaves(vs) == []
