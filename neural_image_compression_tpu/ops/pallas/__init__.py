"""Pallas TPU kernels for the hot entropy-math ops.

These fuse chains XLA treats as many elementwise HLOs into single-VMEM-pass
kernels. Each has a reference jnp implementation it is tested against, and a
`use_pallas` switch so CPU tests run the interpreter.
"""

from neural_image_compression_tpu.ops.pallas.gmm_kernel import (
    fused_mixture_log_likelihood,
)
from neural_image_compression_tpu.ops.pallas.gdn_kernel import fused_gdn

__all__ = ["fused_mixture_log_likelihood", "fused_gdn"]
