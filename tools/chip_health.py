"""Chip-health canary gate (VERDICT r4 item 3).

This box's tunneled v5e has documented SILENT 2-5x degradation windows
(CLAUDE.md): a benchmark captured inside one looks like a framework
regression. The discriminator that caught the round-4 window was the stock
jitted flagship train step — 9.2 ms/step at batch 16 on a healthy chip,
19.2 ms inside the window, while the host-CPU canary stayed normal.

This module institutionalizes that check: `measure_canary()` times exactly
that program and compares it against the known-good envelope; bench tools
call it BEFORE and AFTER their timed section and either refuse to write or
label the artifact `degraded: true`. Known-good anchors (this box):
  * 9.2 ms/step — healthy-morning runs, rounds 3-4
  * 19.2 ms/step — measured degradation window (r4, recovered ~1h later)
Envelope 12.5 ms = known-good +35%, far below the 2x failure mode.

Run standalone for a quick go/no-go (detached; one TPU process at a time):
  PYTHONPATH=.:/root/.axon_site python -u tools/chip_health.py
"""

import json
import os
import sys
import time
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEALTHY_MS = float(os.environ.get("NIC_CANARY_HEALTHY_MS", "12.5"))
BATCH, SIDE, M, K = 16, 256, 128, 3


def _host_canary() -> float:
    """Host matmul ms — separates host contention from chip degradation."""
    import numpy as np

    a = np.random.RandomState(0).rand(512, 512).astype(np.float32)
    t0 = time.perf_counter()
    for _ in range(10):
        a = a @ a
        a /= max(1.0, float(abs(a).max()))
    return (time.perf_counter() - t0) / 10 * 1e3


def measure_canary(iters: int = 30) -> dict:
    """Time the stock jitted flagship train step (batch 16, M=128, K=3).

    Returns {"ms_per_step", "healthy", "envelope_ms", "host_matmul_ms",
    "timestamp"}. Tunnel rule: completion barrier is a scalar fetch, never
    block_until_ready.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from neural_image_compression_tpu.models import (
        JointAutoregressiveHierarchical,
    )
    from neural_image_compression_tpu.train.loss import rd_loss

    model = JointAutoregressiveHierarchical(latent_channels=M, K=K,
                                            dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (BATCH, SIDE, SIDE, 3), jnp.float32)
    params = jax.jit(lambda k, v: model.init(
        {"params": k, "noise": k}, v, training=True))(key, x)["params"]
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(p, o, v, rng):
        def loss_fn(q):
            out = model.apply({"params": q}, v, training=True,
                              rngs={"noise": rng})
            return rd_loss(out, v, 0.005)["loss"]

        loss, g = jax.value_and_grad(loss_fn)(p)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), o, loss

    rng = jax.random.PRNGKey(7)
    params, opt, loss = step(params, opt, x, rng)   # compile
    _ = float(loss)
    # warmup burst then the timed burst; one scalar fetch closes each
    for _ in range(5):
        params, opt, loss = step(params, opt, x, rng)
    _ = float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt, loss = step(params, opt, x, rng)
    _ = float(loss)
    ms = (time.perf_counter() - t0) / iters * 1e3
    return {"ms_per_step": round(ms, 2), "envelope_ms": HEALTHY_MS,
            "healthy": ms <= HEALTHY_MS,
            "host_matmul_ms": round(_host_canary(), 2),
            "timestamp": time.strftime("%Y-%m-%d %H:%M:%S")}


def gate(label: str, iters: int = 30) -> dict:
    """Measure + print one labeled JSON line; returns the record."""
    rec = measure_canary(iters)
    print(f"[chip_health:{label}] {json.dumps(rec)}", flush=True)
    return rec


if __name__ == "__main__":
    rec = gate("standalone")
    sys.exit(0 if rec["healthy"] else 1)
