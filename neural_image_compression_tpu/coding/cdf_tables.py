"""Quantized CDF tables for the factorized bottleneck (z path).

The TPU evaluates the learned per-channel CDF on an integer grid
(`FactorizedEntropyBottleneck.grid_cdf` — the vectorized form of the
reference's per-channel hooks, EntropyModels.py:153-184); here those float
CDFs are deterministically quantized to 16-bit fixed point rows consumed by
the native coder's indexed stream. The last symbol of each row is an ESC
carrying out-of-range values as raw bits.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neural_image_compression_tpu.coding.backend import PROB_SCALE

# Jitted grid_pmf per model instance: the bare model.apply would dispatch the
# CDF-MLP chain primitive-by-primitive on the device (CLAUDE.md tunnel
# gotcha — seconds per new (zmin, zmax) grid instead of one program).
_GRID_PMF_JIT = {}


def _grid_pmf(model, variables, xs):
    fn = _GRID_PMF_JIT.get(id(model))
    if fn is None:
        fn = jax.jit(lambda v, pts: model.apply(
            v, pts,
            method=lambda mdl, p: mdl.factorized_entropy_model.grid_pmf(p)))
        _GRID_PMF_JIT[id(model)] = fn
    return fn(variables, xs)


def quantize_pmf_rows(pmf: np.ndarray) -> np.ndarray:
    """(C, L) float pmf rows (incl. ESC mass as last column) -> (C, L+1)
    uint32 cumulative rows summing to 2^16, every freq >= 1. Deterministic."""
    c, L = pmf.shape
    pmf = np.maximum(pmf.astype(np.float64), 0.0)
    total = pmf.sum(axis=1, keepdims=True)
    total[total <= 0] = 1.0
    budget = PROB_SCALE - L
    freq = 1 + np.floor(pmf / total * budget).astype(np.uint64)
    # hand the remainder to the most likely symbol of each row
    rem = PROB_SCALE - freq.sum(axis=1)
    argmax = pmf.argmax(axis=1)
    freq[np.arange(c), argmax] += rem
    cum = np.zeros((c, L + 1), np.uint32)
    cum[:, 1:] = np.cumsum(freq, axis=1).astype(np.uint32)
    return cum


def factorized_tables(model, variables, zmin: int, zmax: int
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build per-channel CDF rows over integer support [zmin, zmax].

    model/variables: a flax module owning `factorized_entropy_model`.
    Returns (cdfs (C, L+1) uint32, offsets (C,) int32, sizes (C,) int32),
    where L = (zmax - zmin + 1) + 1 (ESC last).
    """
    xs = jnp.arange(zmin, zmax + 1, dtype=jnp.float32)
    pmf = np.asarray(_grid_pmf(model, variables, xs))
    c, n = pmf.shape
    esc = np.clip(1.0 - pmf.sum(axis=1, keepdims=True), 0.0, 1.0)
    rows = np.concatenate([pmf, esc], axis=1)  # (C, n+1)
    cdfs = quantize_pmf_rows(rows)
    offsets = np.full(c, zmin, np.int32)
    sizes = np.full(c, n + 1, np.int32)
    return cdfs, offsets, sizes
