from neural_image_compression_tpu.coding.backend import (
    RansDecoder, encode_gaussian, encode_indexed,
)
from neural_image_compression_tpu.coding.cdf_tables import (
    factorized_tables, quantize_pmf_rows,
)
from neural_image_compression_tpu.coding.refine import (
    make_refiner, refine_latents,
)
from neural_image_compression_tpu.coding.portable import (
    ChannelCBCards, PortableCard, build_channel_cb_cards,
    portable_ar_decode, portable_ar_encode,
)
from neural_image_compression_tpu.coding.codec import (
    ChannelCheckerboardCodec, CheckerboardCodec, FactorizedPriorCodec,
    JointARCodec, MeanScaleHyperpriorCodec, ScalableCodec,
    bitstream_bpp, stream_size, wavefront_order,
)

__all__ = [
    "RansDecoder", "encode_gaussian", "encode_indexed",
    "factorized_tables", "quantize_pmf_rows",
    "ChannelCheckerboardCodec", "CheckerboardCodec",
    "FactorizedPriorCodec", "JointARCodec",
    "MeanScaleHyperpriorCodec", "ScalableCodec", "bitstream_bpp",
    "stream_size", "wavefront_order",
    "make_refiner", "refine_latents",
    "ChannelCBCards", "PortableCard", "build_channel_cb_cards",
    "portable_ar_decode", "portable_ar_encode",
]
