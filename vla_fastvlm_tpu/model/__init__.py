"""Backbone adapter layer (L1) + legacy policy.

Parity with reference ``src/vla_fastvlm/model/__init__.py``.
"""

from .fastvlm_adapter import FastVLMBackbone, FastVLMBackboneConfig, resize_with_pad
from .policy import FastVLMPolicy, FastVLMPolicyConfig

__all__ = [
    "FastVLMBackbone",
    "FastVLMBackboneConfig",
    "FastVLMPolicy",
    "FastVLMPolicyConfig",
    "resize_with_pad",
]
