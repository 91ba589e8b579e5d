"""Serving export: freeze the eval forward into a portable StableHLO artifact.

The reference can only run inference through its live Python/torch module
tree (Models.py:49-105 behind a notebook). For production serving a model
should be a self-contained compiled artifact, loadable without the model's
Python code. This wraps `jax.export`: the jitted eval forward — with the
trained parameters baked in as constants — is lowered to StableHLO and
serialized; any JAX process (same or newer jax, matching platform) can
deserialize and call it, and XLA AOT-compiles it on first use.

The exported signature is serving-shaped: `f(x) -> dict` with per-image (not
batch-mean) rate/quality outputs, so a server can report bpp per request:

    x: float32[B, H, W, 3] in [0,1]  (B symbolic by default; H, W fixed
                                      at export — convs are shape-specialized
                                      for the target resolution on purpose)
    -> {"x_hat":     float32[B, H, W, 3],
        "bpp_total": float32[B], "bpp_y": float32[B], "bpp_z": float32[B]}

Works for all four model families (joint_ar / residual / factorized /
scalable). For real bitstreams use `coding.*Codec` — this artifact is the
analytic-rate eval forward (the reference's own notion of enc+dec,
SURVEY §3.2), i.e. the serving path for quality/rate prediction and
reconstruction-at-the-edge deployments.
"""

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = ["make_serving_fn", "export_model", "save_exported",
           "load_exported"]

_LN2 = math.log(2.0)


def make_serving_fn(model, params):
    """The pure serving function: x -> dict with x_hat + per-image bpp.

    Params are closed over (they become constants in the exported module).
    """

    def serve(x):
        out = model.apply({"params": params}, x, training=False)
        h, w = x.shape[1], x.shape[2]
        npix = float(h * w)

        def bpp(logp):
            # per-image: sum over all non-batch axes
            axes = tuple(range(1, logp.ndim))
            return -jnp.sum(logp.astype(jnp.float32), axis=axes) / _LN2 / npix

        # y-rate = every logp_* stream except z (the scalable model splits
        # y into logp_y1/logp_y2; joint/factorized emit a single logp_y)
        bpp_y = sum(bpp(v) for k, v in out.items()
                    if k.startswith("logp_") and k != "logp_z")
        bpp_z = bpp(out["logp_z"])
        return {"x_hat": jnp.clip(out["x_hat"].astype(jnp.float32), 0.0, 1.0),
                "bpp_y": bpp_y, "bpp_z": bpp_z, "bpp_total": bpp_y + bpp_z}

    return serve


def export_model(model, params, height: int, width: int,
                 batch: Optional[int] = None,
                 platforms: Optional[Sequence[str]] = None):
    """Export the eval forward as a `jax.export.Exported`.

    batch: None -> symbolic batch dimension (any B at call time);
           an int -> that fixed batch size.
    platforms: lowering platforms, e.g. ("tpu", "cpu"); defaults to the
           current default backend. A multi-platform artifact runs on any
           listed backend at the cost of one lowering each.
    """
    from jax import export as jexport

    if height % 64 or width % 64:
        raise ValueError(f"H and W must be multiples of 64 (the model's "
                         f"total downsampling), got {height}x{width}; "
                         "pad first (data.pad_to_multiple)")
    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = batch
    spec = jax.ShapeDtypeStruct((b, height, width, 3), jnp.float32)
    fn = jax.jit(make_serving_fn(model, params))
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jexport.export(fn, **kwargs)(spec)


def save_exported(exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str):
    """Deserialize a saved artifact; call it via `.call(x)` (wrap in
    `jax.jit` for a cached executable)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))
