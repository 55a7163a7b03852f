from .qwen2 import (
    Qwen2Config,
    Qwen2ForCausalLM,
    Qwen2Model,
    init_kv_cache,
    qwen2_0_5b,
    qwen2_1_5b,
    qwen2_7b,
    qwen2_tiny,
)

__all__ = [
    "Qwen2Config",
    "Qwen2ForCausalLM",
    "Qwen2Model",
    "init_kv_cache",
    "qwen2_0_5b",
    "qwen2_1_5b",
    "qwen2_7b",
    "qwen2_tiny",
]
