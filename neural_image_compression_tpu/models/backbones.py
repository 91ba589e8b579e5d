"""Realistic frozen vision backbone: a YOLO-style CSP network expressed as a
GraphBackbone, for the scalable-coding distillation path.

The reference's vision surgery (Extra.py:1-70) operates on an actual YOLO
model — a layer list with `.f` from-indices, CSP (C3) blocks, an SPPF head,
and neck stages whose concats reach back across the cut point. The
`models/vision.py` machinery generalizes that wiring; this module provides a
faithful structural instance (YOLOv5-family backbone + first neck stage) so
the split/distill path is exercised on the topology it exists for:
Conv(BN+SiLU) stems, C3 blocks with internal channel-split + concat, SPPF
(stacked same-size maxpools), a nearest-neighbor upsample, and a neck concat
whose `f` list references a pre-cut layer (forcing the FirstHalf
`prev_outputs` hand-off, Extra.py:21-42 semantics).

All BatchNorms run frozen (use_running_average=True), matching the
reference's eval()-mode backbone; nothing here is meant to train.
"""

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from neural_image_compression_tpu.models.vision import (
    FrozenActivationBlock, GraphBackbone,
)
from neural_image_compression_tpu.ops import Conv2d


class ConvBNSiLU(nn.Module):
    """YOLO 'Conv': conv (no bias) + frozen BatchNorm + SiLU."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = Conv2d(self.features, self.kernel, self.stride,
                   (self.kernel - 1) // 2, use_bias=False,
                   dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=True, dtype=self.dtype)(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    """YOLO bottleneck: 1x1 -> 3x3, optional residual add."""

    features: int
    shortcut: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = ConvBNSiLU(self.features, 1, dtype=self.dtype)(x)
        y = ConvBNSiLU(self.features, 3, dtype=self.dtype)(y)
        if self.shortcut and x.shape[-1] == self.features:
            return x + y
        return y


class C3(nn.Module):
    """CSP bottleneck with 3 convs: split into two 1x1 branches, run n
    bottlenecks on one, concat, fuse with a 1x1."""

    features: int
    n: int = 1
    shortcut: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        half = self.features // 2
        a = ConvBNSiLU(half, 1, dtype=self.dtype)(x)
        for _ in range(self.n):
            a = Bottleneck(half, self.shortcut, dtype=self.dtype)(a)
        b = ConvBNSiLU(half, 1, dtype=self.dtype)(x)
        return ConvBNSiLU(self.features, 1, dtype=self.dtype)(
            jnp.concatenate([a, b], axis=-1))


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): three stacked k=5 same-size maxpools,
    concat all four scales, fuse."""

    features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        half = self.features // 2
        x = ConvBNSiLU(half, 1, dtype=self.dtype)(x)
        pools = [x]
        for _ in range(3):
            pools.append(nn.max_pool(pools[-1], (5, 5), strides=(1, 1),
                                     padding="SAME"))
        return ConvBNSiLU(self.features, 1, dtype=self.dtype)(
            jnp.concatenate(pools, axis=-1))


class Upsample2x(nn.Module):
    """Nearest-neighbor 2x upsample (YOLO neck's nn.Upsample)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")


def build_yolo_backbone(width: int = 16, depth: int = 1,
                        dtype=None) -> GraphBackbone:
    """YOLOv5-family backbone + first neck stage as a GraphBackbone.

      idx  layer                f      grid
       0   Conv(w, 6, s2)      -1     /2   (YOLOv5 6x6 stem)
       1   Conv(2w, 3, s2)     -1     /4
       2   C3(2w)              -1     /4
       3   Conv(4w, 3, s2)     -1     /8   <- P3
       4   C3(4w)              -1     /8
       5   Conv(8w, 3, s2)     -1     /16  <- P4
       6   C3(8w)              -1     /16
       7   SPPF(8w)            -1     /16
       8   Conv(4w, 1)         -1     /16
       9   Upsample2x          -1     /8
      10   C3(4w, no shortcut) [9,4]  /8   (neck concat reaching layer 4)

    Layer 10's `f` list spans the natural cut points (e.g. cut=7), so
    SecondHalf must receive FirstHalf's collected outputs — the exact
    hand-off the reference's YOLO neck forces (Extra.py:21-42)."""
    w = width
    return GraphBackbone(layers=(
        (ConvBNSiLU(w, 6, 2, dtype=dtype), -1),
        (ConvBNSiLU(2 * w, 3, 2, dtype=dtype), -1),
        (C3(2 * w, depth, dtype=dtype), -1),
        (ConvBNSiLU(4 * w, 3, 2, dtype=dtype), -1),
        (C3(4 * w, depth, dtype=dtype), -1),
        (ConvBNSiLU(8 * w, 3, 2, dtype=dtype), -1),
        (C3(8 * w, depth, dtype=dtype), -1),
        (SPPF(8 * w, dtype=dtype), -1),
        (ConvBNSiLU(4 * w, 1, dtype=dtype), -1),
        (Upsample2x(), -1),
        (C3(4 * w, depth, shortcut=False, dtype=dtype), [9, 4]),
    ))


def save_backbone(path: str, width: int, variables) -> None:
    """Persist a backbone's variables (params + frozen batch_stats) plus its
    width to one .npz, so trainings can reference a backbone file instead of
    re-seeding (and so real pretrained weights, once mapped into this
    structure, travel the same way)."""
    import numpy as np

    flat = {}
    for col in ("params", "batch_stats"):
        for p, leaf in jax.tree_util.tree_leaves_with_path(variables[col]):
            key = col + "/" + "/".join(k.key for k in p)
            flat[key] = np.asarray(leaf)
    np.savez(path, __width__=np.int64(width), **flat)


def load_backbone(path: str, depth: int = 1, dtype=None):
    """Inverse of save_backbone: returns (GraphBackbone, variables)."""
    import numpy as np

    fx = np.load(path)
    width = int(fx["__width__"])
    variables = {"params": {}, "batch_stats": {}}
    for key in fx.files:
        if key == "__width__":
            continue
        parts = key.split("/")
        node = variables[parts[0]]
        for k in parts[1:-1]:
            node = node.setdefault(k, {})
        node[parts[-1]] = jnp.asarray(fx[key])
    return build_yolo_backbone(width=width, depth=depth, dtype=dtype), variables


def frozen_activation_from_conv(variables, layer_idx: int,
                                eps: float = 1e-5) -> FrozenActivationBlock:
    """Clone layer `layer_idx`'s BatchNorm statistics into a
    FrozenActivationBlock (the reference builds its distillation target the
    same way: the cut layer's BN, frozen, + SiLU — Extra.py:44-70). The
    layer must be a ConvBNSiLU (its BN is the sub-scope 'BatchNorm_0')."""
    name = f"layers_{layer_idx}_0"  # GraphBackbone names (module, f) pairs
    try:
        bn_params = variables["params"][name]["BatchNorm_0"]
        bn_stats = variables["batch_stats"][name]["BatchNorm_0"]
    except KeyError as e:
        raise ValueError(
            f"layer {layer_idx} has no ConvBNSiLU BatchNorm scope") from e
    return FrozenActivationBlock.from_stats(
        scale=bn_params["scale"], bias=bn_params["bias"],
        mean=bn_stats["mean"], var=bn_stats["var"], eps=eps)
