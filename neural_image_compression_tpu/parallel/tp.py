"""Tensor (channel) parallelism: parameter shardings over the 'model' axis.

The reference has no model parallelism of any kind (its whole device story is
a `device="cuda"` string, Trainer.py:13-14); this is the TPU-native design
for models wider than one chip's HBM or meshes wider than the batch.

Strategy — Megatron-style channel sharding expressed as GSPMD annotations
(no manual collectives): every parameter whose trailing axis is a channel
axis is sharded over 'model', and XLA's sharding propagation partitions the
matching conv/GDN/entropy GEMMs and inserts the channel all-gathers / psums
over ICI on its own. Concretely, per leaf:

  * conv / deconv / masked-conv kernels (kh, kw, cin, cout) -> cout sharded:
    each chip computes its slice of the output channels (the MXU GEMM's N
    dimension), activations become channel-sharded, and XLA re-gathers or
    re-partitions them at the next layer as propagation dictates.
  * biases (cout,) and GDN beta (M,) -> sharded with their layer's output.
  * GDN gamma (M, M) -> columns sharded (the GDN is a single MXU matmul,
    ops/gdn.py, so this is plain 1D GEMM parallelism).
  * factorized entropy model params (M, a, b) -> channel axis is axis 0
    (the channel-BATCHED einsum of entropy/factorized.py), so axis 0 is
    sharded instead.
  * anything not divisible by the axis size (e.g. the final M->3 RGB
    kernel) stays replicated — its FLOPs are negligible.

The same rule applies to optimizer state (Adam mu/nu mirror the param tree,
scalars stay replicated), so `shard_params(opt_state, mesh)` works as-is.

Correctness is sharding-independent by SPMD semantics (up to f32 reduction
order); tests/test_parallel.py asserts tp-sharded train/eval == unsharded
to tight tolerance on the virtual 8-device CPU mesh, and
__graft_entry__.dryrun_multichip runs a (data, model) leg.
"""

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(path: str, shape, tp: int) -> P:
    if len(shape) == 0:
        return P()
    if "factorized_entropy_model" in path:
        # channel axis is axis 0 (channel-batched einsum); trailing axes are
        # the tiny per-channel MLP dims
        if shape[0] % tp == 0:
            return P("model", *(None,) * (len(shape) - 1))
        return P()
    if shape[-1] % tp == 0:
        return P(*(None,) * (len(shape) - 1), "model")
    return P()


def tp_shardings(tree: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings sharding channel axes over 'model'.

    Works for param trees and optimizer-state trees alike (the rule is
    path+shape based). With no 'model' axis every leaf is replicated.
    """
    if "model" not in mesh.axis_names:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)
    tp = mesh.shape["model"]

    def spec(path, leaf):
        pstr = "/".join(str(getattr(q, "key", q)) for q in path)
        return NamedSharding(mesh, _leaf_spec(pstr, leaf.shape, tp))

    return jax.tree_util.tree_map_with_path(spec, tree)


def shard_params(tree: Any, mesh: Mesh) -> Any:
    """device_put a param/opt-state tree with its tensor-parallel shardings."""
    return jax.device_put(tree, tp_shardings(tree, mesh))
