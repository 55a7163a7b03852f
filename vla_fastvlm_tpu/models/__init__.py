from .action_head import ActionChunkHead, ActionExpertHead
from .fastvit import FastViTHD, FastViTHDConfig, fastvithd, fastvithd_tiny
from .fastvlm import (
    FastVLM,
    FastVLMConfig,
    MMProjector,
    fastvlm_0_5b,
    fastvlm_1_5b,
    fastvlm_7b,
    fastvlm_tiny,
    pool_hidden,
    pool_last_text_token,
)
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
    "ActionChunkHead",
    "ActionExpertHead",
    "FastViTHD",
    "FastViTHDConfig",
    "fastvithd",
    "fastvithd_tiny",
    "FastVLM",
    "FastVLMConfig",
    "MMProjector",
    "fastvlm_0_5b",
    "fastvlm_1_5b",
    "fastvlm_7b",
    "fastvlm_tiny",
    "pool_hidden",
    "pool_last_text_token",
    "Qwen2Config",
    "Qwen2ForCausalLM",
    "Qwen2Model",
    "init_kv_cache",
    "qwen2_0_5b",
    "qwen2_1_5b",
    "qwen2_7b",
    "qwen2_tiny",
]
