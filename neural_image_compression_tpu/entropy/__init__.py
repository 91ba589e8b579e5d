from neural_image_compression_tpu.entropy.base import (
    DEFAULT_LIKELIHOOD_LOWER_BOUND, clamp_likelihood,
)
from neural_image_compression_tpu.entropy.factorized import FactorizedEntropyBottleneck
from neural_image_compression_tpu.entropy.gaussian import (
    discretized_gaussian_pmf, gaussian_likelihood,
    discretized_mixture_pmf, mixture_likelihood,
)

__all__ = [
    "DEFAULT_LIKELIHOOD_LOWER_BOUND", "clamp_likelihood",
    "FactorizedEntropyBottleneck",
    "discretized_gaussian_pmf", "gaussian_likelihood",
    "discretized_mixture_pmf", "mixture_likelihood",
]
