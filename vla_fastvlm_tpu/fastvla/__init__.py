"""FastVLA policy stack (current generation).

Parity with reference ``src/vla_fastvlm/fastvla/__init__.py``.
"""

from .configuration_fastvla import FastVLAConfig
from .fastvlm_with_expert import FastVLMWithExpert
from .modeling_fastvla import FastVLAPolicy
from .processor_fastvla import FastVLAProcessor
from .token_policy import FastVLMTokenPolicy

__all__ = [
    "FastVLAConfig",
    "FastVLAPolicy",
    "FastVLAProcessor",
    "FastVLMTokenPolicy",
    "FastVLMWithExpert",
]
