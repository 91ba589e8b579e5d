"""Device mesh construction.

The reference has no distributed code at all (SURVEY §2 items 30-31; a scalar
`device="cuda"` string is its entire device story, Trainer.py:13-14). Here the
parallelism model is TPU-native: a `jax.sharding.Mesh` over all chips with

  * 'data'    — batch (data-parallel) axis; gradients are reduced by
                XLA-inserted psum over ICI when the jitted train step sees
                batch inputs sharded on this axis and replicated params.
  * 'spatial' — optional image-tile axis for large-image encode/eval (the
                sequence-parallel analogue for a fully-convolutional model;
                XLA handles conv halo exchange automatically).
  * 'model'   — optional tensor-parallel axis: conv/GDN/entropy parameters
                are sharded over channels (see parallel/tp.py) and GSPMD
                inserts the channel all-gathers/psums over ICI. Useful when
                a model is too wide for one chip's HBM or when batch alone
                can't fill the mesh; for the ~10-40M-param families here it
                is a capability (and a template for wider models), not a
                speedup at Kodak scale.

Pipeline ('pp') and expert ('ep') axes are deliberately absent: the model
families are 4-10 conv layers deep with no MoE routing — a pipeline stage
would hold <10 ms of work (collective latency dominates) and there are no
experts to shard. dp x sp x tp is the full useful mesh for this workload.

Multi-host/multi-slice scaling uses the same mesh abstraction: call
`jax.distributed.initialize()` before building the mesh and the axes span
all processes (DCN between slices, ICI within).
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host / multi-slice bring-up: call once per process before
    make_mesh(); afterwards jax.devices() spans all processes and the same
    mesh axes ride ICI within a slice and DCN across slices. No-op if JAX
    distributed is already initialized or single-process."""
    import jax

    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()  # env-driven (TPU pods autoconfigure)
        except (RuntimeError, ValueError):
            pass  # best-effort: already initialized / not a pod environment
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        # With an EXPLICIT coordinator, only "already initialized" is benign.
        # A genuine bring-up failure (bad address, timeout) must raise:
        # otherwise every process stays process_count==1 and silently trains
        # an independent replica — the exact failure the Trainer's
        # multi-process guard exists to stop.
        if "already" in str(e).lower():
            return
        raise


def make_mesh(n_devices: Optional[int] = None, spatial: int = 1,
              model: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data mesh by default; optional (data, spatial, model) mesh.

    'model' is innermost (fastest-varying) so tensor-parallel collectives
    ride the closest ICI neighbors; 'data' is outermost so gradient
    all-reduces tolerate the slowest links (DCN across slices)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    inner = spatial * model
    if n % inner:
        raise ValueError(f"{n} devices not divisible by "
                         f"spatial={spatial} * model={model}")
    shape, names = [n // inner], ["data"]
    if spatial > 1:
        shape.append(spatial)
        names.append("spatial")
    if model > 1:
        shape.append(model)
        names.append("model")
    if len(shape) == 1:
        return Mesh(np.asarray(devices), axis_names=("data",))
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard NHWC images: batch over 'data', H over 'spatial' (if present)."""
    if "spatial" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "spatial"))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
