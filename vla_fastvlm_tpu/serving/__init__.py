"""Serving layer (SURVEY.md §7.1 layer 7): KV-cached generation + closed-loop
policy runtime, single-chip and mesh-sharded (TP x DP)."""

from .continuous_batching import GenerationServer
from .generate import build_cache, generate
from .paged_kv import PagedGenerationServer, PagedKVPool
from .policy_runtime import ActionQueuePolicy, BatchedEnvRunner
from .sampling import sample_tokens
from .sharded import ShardedPolicyRuntime, sharded_generate
from .speculative import SpeculativeGenerationServer, SpeculativeGenerator
from .speculative_paged import SpeculativePagedGenerationServer
from .token_policy_server import TokenPolicyServer

__all__ = [
    "ActionQueuePolicy",
    "BatchedEnvRunner",
    "GenerationServer",
    "PagedGenerationServer",
    "PagedKVPool",
    "ShardedPolicyRuntime",
    "SpeculativeGenerationServer",
    "SpeculativeGenerator",
    "SpeculativePagedGenerationServer",
    "TokenPolicyServer",
    "build_cache",
    "generate",
    "sample_tokens",
    "sharded_generate",
]
