"""Pallas TPU kernels: flash attention + the fused RepMixer block.

The standalone depthwise-conv kernel from round 1 (measured slower than
XLA's conv codegen) graduated into ``repmixer.py``'s fused block kernel; see
BASELINE.md for the measured comparison and the ``AUTO_PROFITABLE`` gate.
"""

from .flash_attention import flash_attention, supports_flash
from .repmixer import repmixer_block, supports_fused_repmixer

__all__ = [
    "flash_attention",
    "repmixer_block",
    "supports_flash",
    "supports_fused_repmixer",
]
