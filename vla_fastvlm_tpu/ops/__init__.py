from .norms import rms_norm, layer_norm
from .rope import rope_cos_sin, apply_rope
from .attention import dot_product_attention, repeat_kv, make_attention_bias
from .image import resize_with_pad, resize_bilinear, normalize_imagenet

__all__ = [
    "rms_norm",
    "layer_norm",
    "rope_cos_sin",
    "apply_rope",
    "dot_product_attention",
    "repeat_kv",
    "make_attention_bias",
    "resize_with_pad",
    "resize_bilinear",
    "normalize_imagenet",
]
