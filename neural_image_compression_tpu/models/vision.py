"""Vision-backbone surgery for scalable-coding distillation.

Capability parity with Extra.py:1-70, which splits a YOLO-style torch model
(a layer list where each layer records its input index/indices `f`) into
`FirstHalf` / `SecondHalf` around a cut layer, and builds a
`FrozenActivationBlock` (frozen BatchNorm + SiLU) as the distillation target
activation.

TPU-native generalization: any backbone expressed as a sequence of
(module, f) pairs — `f == -1` means "previous layer's output", an int means
"output of layer f", a list means "concat those outputs on channels" (the
reference's torch.cat dim=1; channels-last here). FirstHalf/SecondHalf slice
that graph functionally; the frozen activation is a pure function of captured
statistics (nothing trainable, matching Extra.py:63-66).
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class GraphBackbone(nn.Module):
    """Sequential graph with skip wiring: layers[i] = (module, f).

    Execution semantics match Extra.py:10-19 — maintain an outputs dict; if
    f != -1, re-route the input from outputs[f] (int) or concat([outputs[j]
    for j in f]) (list) before applying the module.
    """

    layers: Tuple[Tuple[nn.Module, Any], ...]

    def run(self, x: jax.Array, start: int = 0, end: Optional[int] = None,
            prev_outputs: Optional[Dict[int, jax.Array]] = None,
            collect: bool = False):
        outputs: Dict[int, jax.Array] = dict(prev_outputs or {})
        end = len(self.layers) if end is None else end
        for i in range(start, end):
            module, f = self.layers[i]
            if f != -1:
                if isinstance(f, int):
                    x = outputs[f]
                else:
                    # -1 inside a list means "the running x" (the ultralytics
                    # yaml convention, e.g. Concat f=[-1, 6]; Extra.py:14-16)
                    x = jnp.concatenate([x if j == -1 else outputs[j]
                                         for j in f], axis=-1)
            x = module(x)
            outputs[i] = x
        return (x, outputs) if collect else x

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.run(x)


class FirstHalf(nn.Module):
    """Layers [0, cut] of a backbone (Extra.py:4-19)."""

    backbone: GraphBackbone
    cut: int

    def __call__(self, x: jax.Array, collect: bool = False):
        return self.backbone.run(x, 0, self.cut + 1, collect=collect)


class SecondHalf(nn.Module):
    """Layers (cut, end) of a backbone, fed the cut-layer activation
    (Extra.py:21-42)."""

    backbone: GraphBackbone
    cut: int

    def __call__(self, x: jax.Array,
                 prev_outputs: Optional[Dict[int, jax.Array]] = None) -> jax.Array:
        outputs = dict(prev_outputs or {})
        outputs[self.cut] = x
        return self.backbone.run(x, self.cut + 1, None, prev_outputs=outputs)


class FrozenActivationBlock(nn.Module):
    """Frozen BatchNorm (captured statistics) + SiLU (Extra.py:44-70).

    Everything is a constant: nothing here trains, matching the reference's
    requires_grad=False + eval() freeze.
    """

    scale: Any    # (C,) gamma
    bias: Any     # (C,) beta
    mean: Any     # (C,) running mean
    var: Any      # (C,) running var
    eps: float = 1e-5

    @classmethod
    def from_stats(cls, scale, bias, mean, var, eps: float = 1e-5):
        return cls(scale=np.asarray(scale, np.float32),
                   bias=np.asarray(bias, np.float32),
                   mean=np.asarray(mean, np.float32),
                   var=np.asarray(var, np.float32), eps=eps)

    def __call__(self, x: jax.Array) -> jax.Array:
        scale = jnp.asarray(self.scale)
        bias = jnp.asarray(self.bias)
        mean = jnp.asarray(self.mean)
        var = jnp.asarray(self.var)
        norm = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return nn.silu(norm)
