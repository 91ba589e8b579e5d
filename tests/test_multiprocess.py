"""REAL multi-process training test: two OS processes join a
jax.distributed job over CPU devices (2 local each, 4 global), each feeds
its own shard of the global batch through the Trainer, and the resulting
replicated params must match a single-process run on the full global batch
— the end-to-end proof of the multi-host data path
(Trainer._shard_batch + data.shard_for_process + process-0 gating)."""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "_mh_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    env = dict(os.environ,
               PYTHONPATH=_REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
               JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # worker sets its own 2-device flag
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(pid), "2", "18961", str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    results = {}
    for pid in range(2):
        with open(tmp_path / f"result_{pid}.json") as f:
            results[pid] = json.load(f)

    assert results[0]["process_count"] == 2
    # replicated params agree across processes
    assert results[0]["param_sq_norm"] == pytest.approx(
        results[1]["param_sq_norm"], rel=1e-6)
    # observability gating: only process 0 logs and checkpoints
    assert not results[0]["null_logger"]
    assert results[1]["null_logger"]
    assert os.path.isdir(tmp_path / "ckpt")
    assert os.path.isdir(tmp_path / "runs")

    # single-process ground truth on the FULL global batch (this test
    # process has 8 virtual devices; use 4 to match the distributed mesh)
    from neural_image_compression_tpu.models import FactorizedPrior
    from neural_image_compression_tpu.parallel import make_mesh
    from neural_image_compression_tpu.train import Trainer

    rng = np.random.RandomState(0)
    global_batches = list(rng.rand(3, 8, 32, 32, 3).astype(np.float32))
    trainer = Trainer(FactorizedPrior(latent_channels=8), global_batches,
                      max_steps=3, learning_rate=1e-3, seed=7,
                      mesh=make_mesh(4),
                      log_dir=str(tmp_path / "runs_sp"),
                      checkpoint_path=str(tmp_path / "ckpt_sp"))
    trainer.train()
    leaves = jax.tree.leaves(trainer.params)
    norm = float(sum(float((np.asarray(l) ** 2).sum()) for l in leaves))
    assert norm == pytest.approx(results[0]["param_sq_norm"], rel=1e-5)
