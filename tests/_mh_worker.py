"""Worker process for the real multi-process Trainer test
(tests/test_multiprocess.py). Each process joins an N-process
jax.distributed job over CPU devices, feeds its OWN shard of the global
batch through the Trainer, and dumps its final params norm + bookkeeping
for the parent to compare against a single-process run on the full batch.

With resume_steps > 0, every process then constructs a SECOND Trainer with
resume=True against the same checkpoint directory and trains the extra
steps — exercising the multi-host restore + checkpoint barrier path
(process-0 writes, everyone restores the same state).

Usage: python tests/_mh_worker.py <pid> <nprocs> <port> <workdir> [resume_steps]
"""

import json
import os
import sys


def main():
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    workdir = sys.argv[4]
    resume_steps = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nprocs, process_id=pid)

    import numpy as np

    from neural_image_compression_tpu.models import FactorizedPrior
    from neural_image_compression_tpu.parallel import make_mesh
    from neural_image_compression_tpu.train import Trainer
    from neural_image_compression_tpu.train.metrics_logger import NullLogger

    # the global dataset: every process regenerates it identically, then
    # takes the rows its local devices own (mesh device order = process
    # order, so process p gets the p-th contiguous block)
    rng = np.random.RandomState(0)
    global_batches = rng.rand(3, 8, 32, 32, 3).astype(np.float32)
    n_local = 8 // nprocs
    local = [b[pid * n_local:(pid + 1) * n_local] for b in global_batches]

    mesh = make_mesh()  # all global devices
    trainer = Trainer(FactorizedPrior(latent_channels=8), local,
                      max_steps=3, learning_rate=1e-3, seed=7, mesh=mesh,
                      log_dir=os.path.join(workdir, "runs"),
                      checkpoint_path=os.path.join(workdir, "ckpt"))
    trainer.train()

    if resume_steps:
        trainer = Trainer(FactorizedPrior(latent_channels=8), local,
                          max_steps=resume_steps, learning_rate=1e-3,
                          seed=7, mesh=mesh, resume=True,
                          log_dir=os.path.join(workdir, "runs"),
                          checkpoint_path=os.path.join(workdir, "ckpt"))
        trainer.train()

    leaves = jax.tree.leaves(trainer.params)
    norm = float(sum(float((np.asarray(l) ** 2).sum()) for l in leaves))
    with open(os.path.join(workdir, f"result_{pid}.json"), "w") as f:
        json.dump({"pid": pid,
                   "param_sq_norm": norm,
                   "final_step": trainer.step,
                   "null_logger": isinstance(trainer.logger, NullLogger),
                   "process_count": jax.process_count()}, f)


if __name__ == "__main__":
    main()
