"""Serving layer (SURVEY.md §7.1 layer 7): KV-cached generation + closed-loop
policy runtime."""

from .generate import build_cache, generate
from .policy_runtime import ActionQueuePolicy, BatchedEnvRunner

__all__ = ["ActionQueuePolicy", "BatchedEnvRunner", "build_cache", "generate"]
