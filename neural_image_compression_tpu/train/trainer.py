"""Step-based trainer (capability parity with Trainer.py:10-346, TPU-first).

Differences from the reference, by design:
  * The train step is a single jitted, donated function — forward, loss,
    grads, optimizer update all on device; metrics come back as arrays (the
    reference syncs ~10 `.item()`s per step).
  * Checkpoints are Orbax pytrees saved periodically AND at the end (the
    reference saves only once, at the end — Trainer.py:129-131); resume
    restores params/opt-state/step/scheduler and extends max_steps by the
    restored step, matching Trainer.py:70.
  * Observability matches the reference's TensorBoard catalogue
    (Trainer.py:88-121): per-step loss scalars; histograms of latents,
    likelihoods and entropies; dead-channel counts; mixture-component usage;
    paired original/reconstruction images; latent/entropy heatmaps; factorized
    bottleneck CDF/PMF curves — all via MetricsLogger (TB event files + JSONL).
  * Optional data-parallel mesh: pass `mesh=` (a jax.sharding.Mesh with a
    'data' axis) and the same jitted step runs SPMD with the batch sharded
    over devices and gradients psum'd by XLA over ICI.
"""

import math
from functools import partial
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neural_image_compression_tpu.train.loss import rd_loss as default_rd_loss
from neural_image_compression_tpu.train.metrics_logger import MetricsLogger, NullLogger
from neural_image_compression_tpu.train.schedulers import ReduceLROnPlateau, cosine_lr
from neural_image_compression_tpu.utils.checkpoint import (
    checkpoint_exists, checkpoint_keys, restore_checkpoint, save_checkpoint,
)


class Trainer:
    def __init__(self, model, train_loader: Iterable, val_loader: Optional[Iterable] = None,
                 rd_loss: Optional[Callable] = None, lambda_val: float = 0.005,
                 learning_rate: float = 1e-4, optimizer: Optional[optax.GradientTransformation] = None,
                 scheduler: Optional[str] = None, max_steps: int = 10000, resume: bool = False,
                 log_interval: Optional[int] = None, img_interval: Optional[int] = None,
                 val_interval: Optional[int] = None, checkpoint_interval: Optional[int] = None,
                 scalar_interval: int = 1, preemption_safe: bool = False,
                 log_dir: str = "runs/experiment", checkpoint_path: str = "./checkpoints/checkpoint",
                 seed: int = 0, mesh=None, example_batch=None,
                 ema_decay: Optional[float] = None,
                 clip_grad_norm: Optional[float] = None):
        if rd_loss is None:
            rd_loss = default_rd_loss
        self.model = model
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.rd_loss = rd_loss
        self.lambda_val = lambda_val
        self.base_lr = learning_rate
        self.max_steps = max_steps
        self.step = 0
        # Scalars default to every step (reference parity, Trainer.py:89);
        # raise on hardware where a per-step host fetch is expensive.
        self.scalar_interval = max(1, scalar_interval)
        self.log_interval = log_interval or max(1, int(max_steps / 200))
        self.img_interval = img_interval or max(1, int(max_steps / 25))
        self.val_interval = val_interval or max(1, int(max_steps / 200))
        self.checkpoint_interval = checkpoint_interval
        self.checkpoint_path = checkpoint_path
        self.mesh = mesh

        self._train_iter = iter(train_loader)

        # Failure/preemption handling (the reference's only recovery story is
        # manual crash-and-resume, SURVEY §5): on SIGTERM/SIGINT, finish the
        # current step, checkpoint, and return cleanly so the next invocation
        # resumes.
        self._stop_requested = False
        self._preemption_safe = preemption_safe
        if preemption_safe:
            import signal

            def _handler(signum, frame):
                self._stop_requested = True

            signal.signal(signal.SIGTERM, _handler)
            signal.signal(signal.SIGINT, _handler)

        # --- init params/optimizer --------------------------------------
        self._rng = jax.random.PRNGKey(seed)
        if example_batch is None:
            example_batch = self._peek_batch()
        example_batch = jnp.asarray(example_batch)
        if example_batch.dtype == jnp.uint8:
            example_batch = example_batch.astype(jnp.float32) / 255.0
        self._rng, init_key, noise_key = jax.random.split(self._rng, 3)
        # jitted init: unjitted flax init dispatches each primitive separately
        # (minutes on high-latency device transports)
        variables = jax.jit(
            lambda ik, nk, x: model.init({"params": ik, "noise": nk}, x,
                                         training=True)
        )(init_key, noise_key, example_batch)
        self.params = variables["params"]

        if clip_grad_norm is not None and clip_grad_norm <= 0.0:
            raise ValueError(
                f"clip_grad_norm must be > 0, got {clip_grad_norm}")
        if optimizer is None:
            # Global-norm gradient clipping (opt-in; the reference trains
            # unclipped, Trainer.py:76-86, but high-lambda RD objectives can
            # spike late in training — see STATUS round 3). Clipping lives
            # INSIDE inject_hyperparams so opt_state.hyperparams keeps the
            # flat learning_rate the schedulers mutate.
            if clip_grad_norm is not None:
                def _make(learning_rate):
                    return optax.chain(
                        optax.clip_by_global_norm(clip_grad_norm),
                        optax.adam(learning_rate))
                optimizer = optax.inject_hyperparams(_make)(
                    learning_rate=learning_rate)
            else:
                optimizer = optax.inject_hyperparams(optax.adam)(
                    learning_rate=learning_rate)
        elif clip_grad_norm is not None:
            raise ValueError(
                "pass either a custom optimizer or clip_grad_norm, not both "
                "(chain optax.clip_by_global_norm into your optimizer)")
        self.tx = optimizer
        self.opt_state = self.tx.init(self.params)

        # --- EMA of params (deploy-quality weights; standard practice in
        # compression training, absent in the reference). The average is
        # updated inside the jitted train step; validation and eval_params
        # use it so the plateau scheduler tracks the deployable model.
        if ema_decay is not None and not (0.0 < ema_decay < 1.0):
            raise ValueError(f"ema_decay must be in (0, 1), got {ema_decay}")
        self.ema_decay = ema_decay
        # fresh buffers (jnp.array copies): params are donated to the train
        # step, so the EMA tree must not alias them
        self.ema_params = (jax.tree.map(jnp.array, self.params)
                           if ema_decay is not None else None)

        # --- scheduler ---------------------------------------------------
        self.scheduler = scheduler
        if scheduler is not None:
            hp = getattr(self.opt_state, "hyperparams", None)
            if hp is None or "learning_rate" not in hp:
                raise ValueError(
                    f"scheduler={scheduler!r} needs a mutable learning rate: "
                    "wrap the optimizer with optax.inject_hyperparams (e.g. "
                    "optax.inject_hyperparams(optax.adam)(learning_rate=lr)) "
                    "or pass optimizer=None — with a plain optax optimizer "
                    "the schedule would silently never apply")
        self.use_plateau = scheduler == "plateau"
        self.plateau = ReduceLROnPlateau(learning_rate) if self.use_plateau else None

        # --- resume ------------------------------------------------------
        self.resume = resume
        if resume and checkpoint_path is not None and checkpoint_exists(checkpoint_path):
            self.load_checkpoint()

        # --- multi-host --------------------------------------------------
        # Each process runs this same script (SPMD); per-process loaders must
        # yield that process's SHARD of the global batch (see
        # data.shard_for_process) and _shard_batch assembles the global array.
        self._process_count = jax.process_count()
        self._is_main_process = jax.process_index() == 0
        if self._process_count > 1 and mesh is None:
            raise ValueError(
                "multi-process run (jax.process_count() > 1) requires a mesh "
                "spanning all processes (parallel.make_mesh()): without one, "
                "each process would silently train an independent replica on "
                "its own full batch")

        # TB/JSONL observability is host-side: only process 0 writes
        self.logger = (MetricsLogger(log_dir, purge_step=self.step)
                       if self._is_main_process else NullLogger())

        # --- sharding ----------------------------------------------------
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._batch_sharding = NamedSharding(mesh, P("data"))
            self._replicated = NamedSharding(mesh, P())
            # init is seeded identically on every process, so the host value
            # is process-consistent and replication is a plain device_put
            self.params = jax.device_put(self.params, self._replicated)
            self.opt_state = jax.device_put(self.opt_state, self._replicated)
            if self.ema_params is not None:
                self.ema_params = jax.device_put(self.ema_params, self._replicated)
        else:
            self._batch_sharding = None

        def _norm(x):
            if x.dtype == jnp.uint8:
                return x.astype(jnp.float32) / 255.0
            return x

        # Variable-rate (GainedJointAR) runs: the step samples a level per
        # batch; validation pins the MIDDLE level and its lambda so the
        # plateau scheduler tracks one consistent objective.
        levels = getattr(self.model, "levels", None)
        if levels:
            self._val_kwargs = {"level": len(levels) // 2}
            self._val_lambda = float(levels[len(levels) // 2])
        else:
            self._val_kwargs = {}
            self._val_lambda = self.lambda_val

        self._train_step = self._build_train_step()
        self._eval_forward = jax.jit(
            lambda params, x: self.model.apply({"params": params}, _norm(x),
                                               training=False))
        # Validation fused into ONE program returning three scalars: an
        # eager rd_loss over the eval output dispatches ~25 primitives
        # individually (CLAUDE.md: never run un-jitted multi-op code on the
        # tunneled TPU) and forces 3 separate host syncs per val batch.
        self._val_step = jax.jit(
            lambda params, x: (lambda m: (m["loss"], m["bpp_total"], m["psnr"]))(
                self.rd_loss(self.model.apply({"params": params}, _norm(x),
                                              training=False,
                                              **self._val_kwargs),
                             _norm(x), self._val_lambda)))
        self._diag_forward = jax.jit(
            lambda params, x, rng: self.model.apply(
                {"params": params}, _norm(x), training=True, rngs={"noise": rng}))

    # ------------------------------------------------------------------
    def _peek_batch(self):
        # Peek for model.init WITHOUT consuming data: the batch is kept and
        # becomes the first training batch (otherwise the first loader batch
        # of every run would be systematically dropped from training).
        batch = self._next_batch()
        self._pending_batch = batch
        return batch

    def _next_batch(self):
        pending = getattr(self, "_pending_batch", None)
        if pending is not None:
            self._pending_batch = None
            return pending
        try:
            return next(self._train_iter)
        except StopIteration:
            self._train_iter = iter(self.train_loader)
            try:
                return next(self._train_iter)
            except StopIteration:
                raise ValueError(
                    "train_loader yielded no batches (empty dataset or "
                    "batch_size > dataset size with drop_remainder)") from None

    def _build_train_step(self):
        # Single source of truth for the step (donated, uint8-normalizing,
        # mesh-sharded when a mesh is given): parallel.make_train_step.
        from neural_image_compression_tpu.parallel.train_step import make_train_step

        return make_train_step(self.model, self.tx, self.rd_loss,
                               self.lambda_val, mesh=self.mesh,
                               ema_decay=self.ema_decay,
                               levels=getattr(self.model, "levels", None))

    def _set_lr(self, lr: float):
        """Adjust learning rate inside an inject_hyperparams opt state."""
        hp = getattr(self.opt_state, "hyperparams", None)
        if hp is not None and "learning_rate" in hp:
            hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
            return lr
        return None

    @property
    def eval_params(self):
        """The weights to deploy/evaluate: the EMA when enabled, else the
        live params. Validation uses these (the plateau scheduler should
        track the deployable model, not the raw SGD iterate)."""
        return self.ema_params if self.ema_params is not None else self.params

    def current_lr(self) -> float:
        hp = getattr(self.opt_state, "hyperparams", None)
        if hp is not None and "learning_rate" in hp:
            return float(hp["learning_rate"])
        return self.base_lr

    # ------------------------------------------------------------------
    def save_checkpoint(self):
        # params/opt_state are replicated, so any process's copy is the whole
        # state — but EVERY process must enter save_checkpoint: Orbax's save
        # runs a global barrier when process_count > 1, so a process-0-only
        # call deadlocks (Orbax itself makes only the primary host write).
        state = {"params": self.params, "opt_state": self.opt_state,
                 "rng": self._rng}
        if self.ema_params is not None:
            state["ema_params"] = self.ema_params
        aux = {"step": int(self.step)}
        if self.plateau is not None:
            aux["plateau"] = self.plateau.state_dict()
        save_checkpoint(self.checkpoint_path, state, aux)
        if self._is_main_process:
            print(f"Checkpoint saved at step {self.step} -> {self.checkpoint_path}")

    def load_checkpoint(self):
        template = {"params": self.params, "opt_state": self.opt_state,
                    "rng": self._rng}
        # adapt the template to what the checkpoint actually contains
        # (metadata-only read): resuming an EMA run from a pre-EMA checkpoint
        # restores without the ema template and restarts the average from
        # the live params. Any other restore failure (corrupt/mismatched
        # checkpoint) propagates as-is instead of taking a misleading
        # "pre-EMA" recovery path.
        if self.ema_params is not None:
            if "ema_params" in checkpoint_keys(self.checkpoint_path):
                template["ema_params"] = self.ema_params
            else:
                print("checkpoint has no ema_params — EMA restarts from the "
                      "restored params")
        state, aux = restore_checkpoint(self.checkpoint_path, template)
        if self.ema_params is not None:
            self.ema_params = (state["ema_params"] if "ema_params" in state
                               else jax.tree.map(jnp.array, state["params"]))
        self.params = state["params"]
        self.opt_state = jax.tree.unflatten(
            jax.tree.structure(self.opt_state), jax.tree.leaves(state["opt_state"]))
        self._rng = state["rng"]
        self.step = int(aux["step"]) if aux else 0
        if self.plateau is not None and aux and "plateau" in aux:
            self.plateau.load_state_dict(aux["plateau"])
        # Resume semantics: extend the run by the restored step (Trainer.py:70).
        self.max_steps += self.step
        print(f"Checkpoint loaded -> Resuming from step {self.step}")

    # ------------------------------------------------------------------
    def _shard_batch(self, batch):
        """Host batch -> global device array. Single-process: device_put onto
        the mesh (or the default device). Multi-process: the local batch is
        this process's shard of the global batch; assemble the global array
        with make_array_from_process_local_data (data rides ICI/DCN only as
        the sharding demands — no host gather)."""
        if self._batch_sharding is None:
            return jnp.asarray(batch)
        if self._process_count == 1:
            return jax.device_put(jnp.asarray(batch), self._batch_sharding)
        return jax.make_array_from_process_local_data(
            self._batch_sharding, np.asarray(batch))

    def train(self):
        while self.step < self.max_steps:
            batch = self._shard_batch(self._next_batch())
            self._rng, step_rng = jax.random.split(self._rng)

            if self.ema_params is None:
                self.params, self.opt_state, metrics = self._train_step(
                    self.params, self.opt_state, batch, step_rng)
            else:
                (self.params, self.opt_state, self.ema_params,
                 metrics) = self._train_step(self.params, self.opt_state,
                                             self.ema_params, batch, step_rng)

            if self.step % self.scalar_interval == 0:
                self._log_scalars(metrics)

            if self.val_loader is not None and self.step % self.val_interval == 0:
                val_loss = self._validate()
                if self.use_plateau:
                    self._set_lr(self.plateau.step(val_loss))

            if self.scheduler == "cosine":
                self._set_lr(cosine_lr(self.step + 1, self.base_lr, self.max_steps))

            if self.scheduler is not None and self.step % self.scalar_interval == 0:
                # current_lr() syncs a device scalar — keep it off the hot path
                self.logger.scalar("train/learning_rate", self.current_lr(), self.step)

            # Histogram/image diagnostics materialize per-example tensors,
            # which are batch-sharded across processes in a multi-host run
            # (non-addressable); scalars + validation remain logged there.
            if self._process_count == 1 and (
                    self.step % self.log_interval == 0
                    or self.step % self.img_interval == 0):
                # fold_in (not split): diagnostics must not consume the
                # training RNG stream, or runs with different log intervals
                # (or multi-process runs, which skip this branch) would train
                # on different noise keys
                diag_rng = jax.random.fold_in(self._rng, self.step)
                model_out = self._diag_forward(self.params, batch, diag_rng)
                if self.step % self.log_interval == 0:
                    self._log_histograms(model_out)
                    for name in self._latent_streams(model_out):
                        self._log_channel_activity(model_out, name)
                    self._log_entropy_params(model_out)
                if self.step % self.img_interval == 0:
                    self._log_paired_images(batch, model_out)
                    for name in self._latent_streams(model_out):
                        if name in model_out:
                            self._log_entropy_heatmap(model_out, name)
                            self._log_latent_heatmap(model_out, name)
                    self._log_entropy_cdf(model_out, "z")

            if (self.checkpoint_interval and self.checkpoint_path is not None
                    and self.step > 0
                    and self.step % self.checkpoint_interval == 0):
                self.save_checkpoint()

            self.step += 1
            if self._should_stop():
                print(f"stop requested — checkpointing at step {self.step}")
                break

        self.logger.flush()
        if self.checkpoint_path is not None:
            self.save_checkpoint()
        return self.params

    # ------------------------------------------------------------------
    def _should_stop(self) -> bool:
        """Cross-process-consistent stop decision. SIGTERM can reach a subset
        of hosts; acting on a local flag would send that subset into
        save_checkpoint's GLOBAL Orbax barrier while the rest keep training
        (deadlock / mismatched-step checkpoint). Reduce with logical-OR so
        every process breaks at the same step."""
        if self._process_count == 1 or not self._preemption_safe:
            return self._stop_requested
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.array([self._stop_requested], np.int32))
        return bool(np.asarray(flags).any())

    def _log_scalars(self, metrics):
        # filter on .ndim WITHOUT materializing: per-example metric arrays
        # are batch-sharded, and fetching them in a multi-process run would
        # touch non-addressable shards (scalars are replicated — safe).
        # One device_get for the whole scalar sub-dict: a per-key np.asarray
        # would cost ~11 separate device->host round-trips per logged step.
        scalars = {k: v for k, v in metrics.items()
                   if getattr(v, "ndim", None) == 0 or np.ndim(v) == 0}
        for k, v in jax.device_get(scalars).items():
            self.logger.scalar(f"losses/{k}", v, self.step)

    def _validate(self) -> float:
        total_loss = bpp = psnr = 0.0
        n = 0
        for imgs in self.val_loader:
            l, b, p = jax.device_get(self._val_step(self.eval_params,
                                                    jnp.asarray(imgs)))
            total_loss += float(l)
            bpp += float(b)
            psnr += float(p)
            n += 1
        if self._process_count > 1:
            # per-process val shards: reduce so every process sees the same
            # validation loss (the plateau scheduler must not diverge)
            from jax.experimental import multihost_utils

            sums = multihost_utils.process_allgather(
                np.array([total_loss, bpp, psnr, float(n)], np.float64))
            total_loss, bpp, psnr, n = np.asarray(sums).sum(axis=0)
        if n == 0:
            return math.inf
        self.logger.scalar("validation/validation_loss", total_loss / n, self.step)
        self.logger.scalar("validation/validation_bpp", bpp / n, self.step)
        self.logger.scalar("validation/validation_psnr", psnr / n, self.step)
        return total_loss / n

    @staticmethod
    def _latent_streams(out):
        """Latent stream names present in a model-out dict: ('y', 'z') for the
        joint models, ('y1', 'y2', 'z') for the scalable model."""
        return [n for n in ("y", "y1", "y2", "z") if f"logp_{n}" in out]

    def _log_histograms(self, out):
        ln2 = math.log(2.0)
        pairs = [("latents/y", "y"), ("latents/y_hat", "y_in"),
                 ("latents/z", "z"), ("latents/z_hat", "z_in"),
                 ("probability/logp_y", "logp_y"), ("probability/logp_z", "logp_z"),
                 ("probability/p_y", "p_y"), ("probability/p_z", "p_z")]
        for tag, key in pairs:
            if key in out:
                self.logger.histogram(tag, np.asarray(out[key]), self.step)
        for name in self._latent_streams(out):
            logp = np.asarray(out[f"logp_{name}"])
            self.logger.histogram(f"entropy/{name}", -logp / ln2, self.step)
            per_comp = -logp.sum(axis=(1, 2)) / ln2  # NHWC: sum spatial -> (B, C)
            self.logger.histogram(f"entropy/{name}_per_component", per_comp, self.step)
            self.logger.scalar(f"probability/logp_{name}_mean", logp.mean(), self.step)
            self.logger.scalar(f"probability/p_{name}_mean",
                               np.asarray(out[f"p_{name}"]).mean(), self.step)
            self.logger.scalar(f"entropy/entropy_{name}_mean",
                               (-logp / ln2).mean(), self.step)

    def _log_channel_activity(self, out, name="y"):
        """Dead-channel count by entropy (Trainer.py:197-203)."""
        logp = np.asarray(out["logp_" + name])
        avg_bits_per_c = (-logp / math.log(2.0)).mean(axis=(0, 1, 2))  # [C]
        dead = float((avg_bits_per_c < 1e-4).sum())
        self.logger.scalar(f"activity/{name}_dead_channels_by_entropy", dead, self.step)

    def _log_entropy_params(self, out):
        # suffix "" = joint models; "1"/"2" = scalable layers
        for sfx in ("", "1", "2"):
            if f"mu{sfx}" in out and f"sigma{sfx}" in out:
                self.logger.histogram(f"entropy_params/mu{sfx}",
                                      np.asarray(out[f"mu{sfx}"]), self.step)
                self.logger.histogram(f"entropy_params/sigma{sfx}",
                                      np.asarray(out[f"sigma{sfx}"]), self.step)
            if f"weights{sfx}" in out:
                w = np.asarray(out[f"weights{sfx}"])  # (B,H,W,K,M)
                self.logger.histogram(f"entropy_params/weights{sfx}", w, self.step)
                self.logger.histogram(f"entropy_params/mus{sfx}",
                                      np.asarray(out[f"mus{sfx}"]), self.step)
                self.logger.histogram(f"entropy_params/sigmas{sfx}",
                                      np.asarray(out[f"sigmas{sfx}"]), self.step)
                used = float((w > 1e-4).sum(axis=-2).mean())
                self.logger.scalar(f"entropy_params/used_components_mean{sfx}",
                                   used, self.step)

    def _log_paired_images(self, imgs, out, max_samples: int = 4):
        imgs = np.asarray(imgs)
        if imgs.dtype == np.uint8:
            imgs = imgs.astype(np.float32) / 255.0
        recon = np.clip(np.asarray(out["x_hat"]), 0, 1)
        n = min(max_samples, imgs.shape[0])
        rows = []
        for i in range(n):
            a = np.clip(imgs[i], 0, 1)
            rows.append(np.concatenate([a, recon[i]], axis=1))  # side by side
        grid = np.concatenate(rows, axis=0)
        self.logger.image("comparison/paired", grid, self.step)

    def _select_high_entropy_channel(self, out, name):
        logp = np.asarray(out["logp_" + name])[0]  # (H, W, C)
        return int(logp.sum(axis=(0, 1)).argmin())  # highest entropy = lowest logp

    def _log_entropy_heatmap(self, out, name="y"):
        logp = np.asarray(out["logp_" + name])[0]
        ch = self._select_high_entropy_channel(out, name)
        ent = -logp[:, :, ch] / math.log(2.0)
        rng = ent.max() - ent.min()
        self.logger.image(f"heatmaps/quantized_{name}_entropy",
                          (ent - ent.min()) / (rng + 1e-12), self.step)

    def _log_latent_heatmap(self, out, name="y"):
        x = np.asarray(out[name])[0]
        ch = self._select_high_entropy_channel(out, name)
        hm = x[:, :, ch]
        rng = hm.max() - hm.min()
        self.logger.image(f"heatmaps/latent_{name}_heatmap",
                          (hm - hm.min()) / (rng + 1e-12), self.step)

    def _log_entropy_cdf(self, out, name="z", num_points: int = 200):
        """Factorized-bottleneck CDF/PMF curves for low/median/high-entropy
        channels (Trainer.py:255-345)."""
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:  # pragma: no cover
            return
        if f"logp_{name}" not in out:
            return
        logp = np.asarray(out[f"logp_{name}"])[0]  # (H, W, C)
        ent_per_ch = -logp.sum(axis=(0, 1)) / math.log(2.0)
        order = np.argsort(ent_per_ch)
        chans = [int(order[0]), int(order[len(order) // 2]), int(order[-1])]

        zvals = np.asarray(out[name])[0]
        lo = zvals.min() - 3 * zvals.std()
        hi = zvals.max() + 3 * zvals.std()
        xs = np.linspace(lo, hi, num_points).astype(np.float32)

        # jit the two fixed-shape grid programs (built once, cached on self):
        # an eager model.apply dispatches the whole CDF-MLP chain primitive by
        # primitive over the tunneled device (CLAUDE.md gotcha).
        if not hasattr(self, "_grid_fns"):
            def _make(method):
                def f(params, pts):
                    return self.model.apply(
                        {"params": params}, pts,
                        method=lambda mdl, p:
                        mdl.factorized_entropy_model.grid_cdf(p)
                        if method == "cdf"
                        else mdl.factorized_entropy_model.grid_pmf(p))
                return jax.jit(f)
            self._grid_fns = {m: _make(m) for m in ("cdf", "pmf")}

        def _grid(method, pts):
            return np.asarray(self._grid_fns[method](self.params,
                                                     jnp.asarray(pts)))

        try:
            cdf_all = _grid("cdf", xs)
            pmf_all = _grid("pmf", xs)
        except Exception:  # model without a factorized bottleneck
            return

        fig, ax = plt.subplots(1, 1, figsize=(6, 3.5))
        for ch in chans:
            zc = zvals[:, :, ch]
            ax.axvspan(zc.min(), zc.max(), alpha=0.15)
            ax.plot(xs, cdf_all[ch], linewidth=1.5,
                    label=f"ch {ch} ({ent_per_ch[ch]:.2f} bits)")
        ax.set_title("Factorized bottleneck CDF (per channel)")
        ax.set_ylim(0, 1)
        ax.legend(fontsize=8)
        self.logger.figure("bottleneck/cdf", fig, self.step)
        plt.close(fig)

        fig, ax = plt.subplots(1, 1, figsize=(6, 3.5))
        for ch in chans:
            ax.plot(xs, pmf_all[ch], linewidth=1.5,
                    label=f"ch {ch} ({ent_per_ch[ch]:.2f} bits)")
        ax.set_title("Factorized bottleneck PMF")
        ax.legend(fontsize=8)
        self.logger.figure("bottleneck/pmf", fig, self.step)
        plt.close(fig)
