"""Weight/checkpoint/tokenizer I/O (SURVEY.md §7.1 layer 3)."""

from .checkpoint import (
    flatten_params,
    load_policy_from_checkpoint,
    load_policy_state,
    load_train_state,
    save_policy_checkpoint,
    save_train_state,
    unflatten_params,
)
from .lora import (
    init_lora,
    load_lora,
    lora_with_ids,
    merge_lora,
    stack_loras,
)
from .model_loader import (
    infer_size_from_tower_name,
    load_fastvlm_params,
    resolve_fastvlm_config,
)
from .tokenizer import ByteTokenizer, HFTokenizerAdapter, TokenBatch, load_tokenizer
from .vision_convert import convert_vision_tower
from .weights import (
    convert_fastvithd_state_dict,
    convert_qwen2_state_dict,
    fold_conv_bn,
    torch_conv_to_flax,
)

__all__ = [
    "ByteTokenizer",
    "HFTokenizerAdapter",
    "TokenBatch",
    "convert_fastvithd_state_dict",
    "convert_qwen2_state_dict",
    "convert_vision_tower",
    "flatten_params",
    "fold_conv_bn",
    "infer_size_from_tower_name",
    "init_lora",
    "load_fastvlm_params",
    "load_lora",
    "load_policy_from_checkpoint",
    "load_policy_state",
    "load_tokenizer",
    "load_train_state",
    "lora_with_ids",
    "merge_lora",
    "resolve_fastvlm_config",
    "stack_loras",
    "save_policy_checkpoint",
    "save_train_state",
    "torch_conv_to_flax",
    "unflatten_params",
]
