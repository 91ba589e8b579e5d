"""neural_image_compression_tpu — a TPU-native (JAX/XLA/Pallas/pjit) learned
image compression framework.

Re-implements, TPU-first, the full capability surface of the reference PyTorch
codebase `achraf-15/neural_image_compression` (see SURVEY.md): GDN-based conv
analysis/synthesis transforms, scale-hyperprior with a learned factorized
entropy bottleneck, masked-conv autoregressive context modeling with
mean-scale-Gaussian / Gaussian-mixture conditionals, rate-distortion training,
Kodak evaluation, scalable two-layer coding — plus a real rANS bitstream codec,
data-parallel training over a device mesh, and a test suite, none of which the
reference has.

Conventions (TPU-first, deliberately different from the reference):
  * NHWC layouts everywhere (reference is NCHW).
  * Pure-functional modules (flax.linen); masked convs mask weights
    functionally at apply time (reference mutates weight.data in place,
    ContextModels.py:19).
  * Entropy math always float32; transform compute dtype configurable (bf16).
  * Losses return JAX arrays, never host-synced floats (reference calls
    `.item()` every step, RateDistortionLoss.py:40-47).
"""

__version__ = "0.1.0"

from neural_image_compression_tpu import config
from neural_image_compression_tpu.config import Config, build_model
from neural_image_compression_tpu import (
    coding, data, entropy, evaluation, models, ops, parallel, serving, train,
    utils,
)

__all__ = [
    "ops",
    "entropy",
    "models",
    "train",
    "evaluation",
    "data",
    "coding",
    "parallel",
    "serving",
    "utils",
    "config",
    "Config",
    "build_model",
]
