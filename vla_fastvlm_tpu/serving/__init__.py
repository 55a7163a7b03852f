"""Serving layer (SURVEY.md §7.1 layer 7): KV-cached generation + closed-loop
policy runtime."""

from .continuous_batching import GenerationServer
from .generate import build_cache, generate
from .policy_runtime import ActionQueuePolicy, BatchedEnvRunner

__all__ = [
    "ActionQueuePolicy",
    "BatchedEnvRunner",
    "GenerationServer",
    "build_cache",
    "generate",
]
