from neural_image_compression_tpu.evaluation.msssim import ms_ssim, ssim, rgb_to_luma
from neural_image_compression_tpu.evaluation.bdrate import bd_psnr, bd_rate
from neural_image_compression_tpu.evaluation.health import curve_health
from neural_image_compression_tpu.evaluation.anchors import (
    classical_rd_curve, classical_rd_point,
)
from neural_image_compression_tpu.evaluation.viz import (
    plot_information_evolution, plot_metric_evolution,
)
from neural_image_compression_tpu.evaluation.evaluator import (
    CompressionEvaluator, VisionCompressionEvaluator, compute_metrics, normalize_map,
)

__all__ = ["ms_ssim", "ssim", "rgb_to_luma", "bd_rate", "bd_psnr",
           "classical_rd_curve", "classical_rd_point",
           "CompressionEvaluator",
           "VisionCompressionEvaluator", "compute_metrics", "normalize_map",
           "plot_information_evolution", "plot_metric_evolution"]
