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
import numpy as np
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


class Concat(nn.Module):
    """Identity placeholder for ultralytics' Concat layers: GraphBackbone
    concatenates a list-valued `f` before calling the module, so this keeps
    layer indices 1:1 with the yolov5 yaml while adding no computation."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return x


# C3 depth multipliers per layer index (x depth): the yolov5 yaml's
# [3, 6, 9, 3] backbone / [3, 3] neck ladder divided by its depth_multiple
# baseline, i.e. depth=1 == yolov5n/s, depth=2 == yolov5m's (2,4,6,2,2,2).
_C3_DEPTH = {2: 1, 4: 2, 6: 3, 8: 1, 13: 1, 17: 1}


def build_yolo_backbone(width: int = 16, depth: int = 1,
                        dtype=None) -> GraphBackbone:
    """The real YOLOv5-v6 backbone + neck through the P3 feature map, as a
    GraphBackbone with layer indices matching the ultralytics yaml 1:1 (so
    `model.{i}.*` checkpoint keys map straight onto `layers_{i}_0`):

      idx  layer                 f        grid  ch
       0   Conv(w, 6, s2)       -1        /2    w     (6x6 stem)
       1   Conv(2w, 3, s2)      -1        /4    2w
       2   C3(2w, d)            -1        /4    2w
       3   Conv(4w, 3, s2)      -1        /8    4w
       4   C3(4w, 2d)           -1        /8    4w
       5   Conv(8w, 3, s2)      -1        /16   8w
       6   C3(8w, 3d)           -1        /16   8w
       7   Conv(16w, 3, s2)     -1        /32   16w
       8   C3(16w, d)           -1        /32   16w
       9   SPPF(16w)            -1        /32   16w
      10   Conv(8w, 1)          -1        /32   8w
      11   Upsample2x           -1        /16   8w
      12   Concat               [11, 6]   /16   16w
      13   C3(8w, d, no-cut)    -1        /16   8w
      14   Conv(4w, 1)          -1        /16   4w
      15   Upsample2x           -1        /8    4w
      16   Concat               [15, 4]   /8    8w
      17   C3(4w, d, no-cut)    -1        /8    4w   <- P3

    width=16, depth=1 is exactly yolov5n (w = 64*width_multiple). The neck
    concats (layers 12/16) reference layers 6/4, so any cut in [4, 15]
    forces SecondHalf to read pre-cut outputs through prev_outputs — the
    hand-off the reference's surgery exists for (Extra.py:21-42)."""
    w, d = width, depth

    def c3(i, ch, shortcut=True):
        return C3(ch, _C3_DEPTH[i] * d, shortcut=shortcut, dtype=dtype)

    return GraphBackbone(layers=(
        (ConvBNSiLU(w, 6, 2, dtype=dtype), -1),
        (ConvBNSiLU(2 * w, 3, 2, dtype=dtype), -1),
        (c3(2, 2 * w), -1),
        (ConvBNSiLU(4 * w, 3, 2, dtype=dtype), -1),
        (c3(4, 4 * w), -1),
        (ConvBNSiLU(8 * w, 3, 2, dtype=dtype), -1),
        (c3(6, 8 * w), -1),
        (ConvBNSiLU(16 * w, 3, 2, dtype=dtype), -1),
        (c3(8, 16 * w), -1),
        (SPPF(16 * w, dtype=dtype), -1),
        (ConvBNSiLU(8 * w, 1, dtype=dtype), -1),
        (Upsample2x(), -1),
        (Concat(), [11, 6]),
        (c3(13, 8 * w, shortcut=False), -1),
        (ConvBNSiLU(4 * w, 1, dtype=dtype), -1),
        (Upsample2x(), -1),
        (Concat(), [15, 4]),
        (c3(17, 4 * w, shortcut=False), -1),
    ))


def save_backbone(path: str, width: int, variables, depth: int = 1) -> None:
    """Persist a backbone's variables (params + frozen batch_stats) plus its
    (width, depth) architecture to one .npz, so trainings can reference a
    backbone file instead of re-seeding (and so real pretrained weights, once
    mapped into this structure, travel the same way)."""
    import numpy as np

    flat = {}
    for col in ("params", "batch_stats"):
        for p, leaf in jax.tree_util.tree_leaves_with_path(variables[col]):
            key = col + "/" + "/".join(k.key for k in p)
            flat[key] = np.asarray(leaf)
    np.savez(path, __width__=np.int64(width), __depth__=np.int64(depth),
             **flat)


def load_backbone(path: str, dtype=None):
    """Inverse of save_backbone: returns (GraphBackbone, variables)."""
    import numpy as np

    fx = np.load(path)
    width = int(fx["__width__"])
    depth = int(fx["__depth__"]) if "__depth__" in fx.files else 1
    variables = {"params": {}, "batch_stats": {}}
    for key in fx.files:
        if key.startswith("__"):
            continue
        parts = key.split("/")
        node = variables[parts[0]]
        for k in parts[1:-1]:
            node = node.setdefault(k, {})
        # numpy leaves: jnp.asarray here would device-put hundreds of small
        # arrays one-by-one over the tunnel; jit ships them efficiently later
        node[parts[-1]] = np.asarray(fx[key])
    return build_yolo_backbone(width=width, depth=depth, dtype=dtype), variables


def distillation_targets(backbone: GraphBackbone, variables, cut: int):
    """(frozen_activation, V) for vision_rd_loss from a frozen backbone:
    V = jitted FirstHalf(cut) forward (jit matters — calling a deep backbone
    eagerly per eval image dispatches every primitive separately over a
    tunneled device), frozen_activation = the cut ConvBNSiLU's frozen
    BN + SiLU. One shared construction for the CLI, the example driver, and
    tests (Extra.py:21-70 semantics)."""
    from neural_image_compression_tpu.models.vision import FirstHalf

    fh = FirstHalf(backbone=backbone, cut=cut)
    nested = {"params": {"backbone": variables["params"]},
              "batch_stats": {"backbone": variables["batch_stats"]}}
    V = jax.jit(lambda img: fh.apply(nested, img))
    return frozen_activation_from_conv(variables, cut), V


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
