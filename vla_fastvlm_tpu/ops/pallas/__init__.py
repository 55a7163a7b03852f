"""Pallas TPU kernels (flash attention, depthwise conv)."""

from .depthwise import depthwise_conv, supports_pallas_dw
from .flash_attention import flash_attention, supports_flash

__all__ = [
    "depthwise_conv",
    "flash_attention",
    "supports_flash",
    "supports_pallas_dw",
]
