"""Orbax-backed checkpointing.

Replaces the reference's single-file `torch.save` checkpoint
(Trainer.py:52-71) with Orbax pytree checkpoints: {params, opt_state, step,
scheduler state, PRNG key} saved atomically, restorable with the same resume
semantics (restore extends max_steps by the restored step — Trainer.py:70).
"""

import json
import os
from typing import Any, Optional

import jax


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Any, aux: Optional[dict] = None) -> None:
    """Save a pytree `state` (and a small JSON `aux` dict) at `path`.

    Multi-process: EVERY process must call this (Orbax's save runs a global
    barrier whenever jax.process_count() > 1 — a process-0-only call
    deadlocks). Orbax coordinates so only the primary host writes the tree;
    the aux sidecar is written by process 0 after the barrier completes.
    """
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    state = jax.device_get(state)
    _ckptr().save(path, state, force=True)
    if aux is not None and jax.process_index() == 0:
        # atomic write (tmp + rename): a preemption mid-dump would otherwise
        # leave a truncated sidecar that breaks every subsequent resume —
        # defeating the preemption-safe checkpoint story
        tmp = path + ".aux.json.tmp"
        with open(tmp, "w") as f:
            json.dump(aux, f)
        os.replace(tmp, path + ".aux.json")


def restore_checkpoint(path: str, template: Any):
    """Restore a pytree saved by save_checkpoint; returns (state, aux)."""
    path = os.path.abspath(path)
    state = _ckptr().restore(path, item=jax.device_get(template))
    aux = None
    if os.path.exists(path + ".aux.json"):
        with open(path + ".aux.json") as f:
            aux = json.load(f)
    return state, aux


def restore_raw(path: str):
    """Restore the full saved tree as nested dicts (no structure template)."""
    return _ckptr().restore(os.path.abspath(path))


def checkpoint_keys(path: str) -> set:
    """Top-level keys of a saved checkpoint, from Orbax metadata only (no
    array data is read). Lets callers adapt their restore template to what
    the checkpoint actually contains (e.g. pre-EMA checkpoints lack
    'ema_params') instead of guessing from restore failures."""
    md = _ckptr().metadata(os.path.abspath(path))
    item = getattr(md, "item_metadata", md)
    return set(item.keys())


def checkpoint_exists(path: str) -> bool:
    return os.path.isdir(os.path.abspath(path))
