"""Dataclass configuration + model factory.

The reference has no config system — hyperparameters are constructor kwargs
and notebook literals (SURVEY §5; Main.ipynb cells 5-6). Here every run is
described by small dataclasses, serializable to/from JSON for reproducibility.
The defaults reproduce the reference's published flagship run:
JointAutoregressiveHierarchical(latent_channels=128, K=3), lambda=0.005,
Adam lr=1e-4, batch 16 on 256^2 patches (Main.ipynb cell 6).
"""

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class ModelConfig:
    name: str = "joint_ar"  # joint_ar | residual | factorized | hyperprior
                            # | scalable | checkerboard | channel_cb (alias
                            # elic) | gained | gained_hyperprior
                            # | gained_checkerboard | gained_channel_cb
    latent_channels: int = 128
    K: int = 3
    base_channels: int = 96        # scalable only (M1 < M)
    dtype: Optional[str] = None    # None (f32) | 'bf16' transform compute
    levels: Optional[list] = None  # gained* only: ascending lambda
                                   # ladder (None -> family defaults)


@dataclass
class DataConfig:
    train_dir: str = "./data/train"
    val_dir: Optional[str] = None
    batch_size: int = 16
    shuffle: bool = True
    seed: int = 0


@dataclass
class TrainConfig:
    lambda_rd: float = 0.005
    loss: str = "mse"                    # 'mse' (rd_loss, reference objective)
                                         # | 'msssim' (bpp + lambda*(1-MS-SSIM);
                                         #   lambda scales differ — see
                                         #   train.loss.msssim_rd_loss)
    learning_rate: float = 1e-4
    max_steps: int = 100000
    scheduler: Optional[str] = None      # None | 'cosine' | 'plateau'
    log_interval: Optional[int] = None
    img_interval: Optional[int] = None
    val_interval: Optional[int] = None
    checkpoint_interval: Optional[int] = None
    log_dir: str = "runs/experiment"
    checkpoint_path: str = "./checkpoints/checkpoint"
    resume: bool = False
    seed: int = 0
    gamma: float = 0.0                   # vision distillation weight (scalable)
    backbone: str = ""                   # saved backbone .npz (models.save_backbone);
                                         # activates the distillation term when gamma>0
    backbone_cut: int = 3                # backbone split layer (FirstHalf = [0, cut])
    data_parallel: bool = False          # shard the batch over all devices
    scalar_interval: int = 1             # per-step scalar logging cadence
    preemption_safe: bool = False        # SIGTERM -> checkpoint + clean exit
    ema_decay: float = 0.0               # >0 enables EMA params (e.g. 0.999);
                                         # checkpointed; eval prefers them
    clip_grad_norm: float = 0.0          # >0 clips gradients by global norm
                                         # (stabilizes high-lambda training)


@dataclass
class EvalConfig:
    data_dir: str = "./data/kodak"
    lambda_rd: float = 0.005
    save_dir: str = "./eval_results"
    caption: str = ""
    nb_steps: int = 0


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=1)

    @classmethod
    def from_json(cls, text: str) -> "Config":
        raw = json.loads(text)
        return cls(model=ModelConfig(**raw.get("model", {})),
                   data=DataConfig(**raw.get("data", {})),
                   train=TrainConfig(**raw.get("train", {})),
                   eval=EvalConfig(**raw.get("eval", {})))


def build_model(cfg: ModelConfig):
    import jax.numpy as jnp

    from neural_image_compression_tpu.models import (
        CheckerboardHierarchical, FactorizedPrior, GainedChannelCheckerboard,
        GainedCheckerboard, GainedHyperprior, GainedJointAR,
        HierarchicalMixtureResidual, JointAutoregressiveHierarchical,
        MeanScaleHyperprior, ScalableImageCoding,
    )

    dtype = jnp.bfloat16 if cfg.dtype == "bf16" else None
    if cfg.name in ("gained", "gained_hyperprior", "gained_checkerboard",
                    "gained_channel_cb"):
        kwargs = {"levels": tuple(cfg.levels)} if cfg.levels else {}
        cls = {"gained": GainedJointAR,
               "gained_hyperprior": GainedHyperprior,
               "gained_checkerboard": GainedCheckerboard,
               "gained_channel_cb": GainedChannelCheckerboard}[cfg.name]
        return cls(latent_channels=cfg.latent_channels, K=cfg.K,
                   dtype=dtype, **kwargs)
    if cfg.name == "joint_ar":
        return JointAutoregressiveHierarchical(
            latent_channels=cfg.latent_channels, K=cfg.K, dtype=dtype)
    if cfg.name == "checkerboard":
        return CheckerboardHierarchical(
            latent_channels=cfg.latent_channels, K=cfg.K, dtype=dtype)
    if cfg.name in ("channel_cb", "elic"):
        from neural_image_compression_tpu.models import (
            ChannelCheckerboardHierarchical,
        )

        return ChannelCheckerboardHierarchical(
            latent_channels=cfg.latent_channels, K=cfg.K, dtype=dtype)
    if cfg.name == "residual":
        return HierarchicalMixtureResidual(
            latent_channels=cfg.latent_channels, K=cfg.K, dtype=dtype)
    if cfg.name == "factorized":
        return FactorizedPrior(latent_channels=cfg.latent_channels, dtype=dtype)
    if cfg.name == "hyperprior":
        return MeanScaleHyperprior(
            latent_channels=cfg.latent_channels, K=cfg.K, dtype=dtype)
    if cfg.name == "scalable":
        return ScalableImageCoding(latent_channels=cfg.latent_channels,
                                   base_channels=cfg.base_channels,
                                   K=cfg.K, dtype=dtype)
    raise ValueError(f"unknown model name: {cfg.name}")
