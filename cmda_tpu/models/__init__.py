from .mit import MixVisionTransformer, MIT_VARIANTS
from .daformer import DAFormerHead, DAFormerFusionHead
from .fusion import build_fusion_module
from .segmentor import EncoderDecoder, FusionEncoderDecoder

__all__ = [
    "MixVisionTransformer", "MIT_VARIANTS",
    "DAFormerHead", "DAFormerFusionHead",
    "build_fusion_module",
    "EncoderDecoder", "FusionEncoderDecoder",
]
