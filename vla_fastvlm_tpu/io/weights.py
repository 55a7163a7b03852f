"""Checkpoint weight conversion: HF/torch state dicts -> Flax param pytrees.

The reference gets its weights through ``AutoModelForCausalLM.from_pretrained``
with ``trust_remote_code=True`` (``fastvlm_adapter.py:185-191``). On TPU we
load the same safetensors files directly and remap names:

- torch ``nn.Linear.weight`` is (out, in) -> flax ``Dense.kernel`` is (in, out)
  (transpose),
- per-layer weights ``model.layers.{i}.*`` are stacked along a new leading
  axis when the decoder uses ``nn.scan`` (stacked-params layout),
- conv weights (vision tower) are (O, I, kH, kW) -> flax (kH, kW, I, O).

All outputs are numpy arrays (host) so callers control device placement and
sharding via ``jax.device_put`` with NamedSharding.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np

from ..models.qwen2 import Qwen2Config


def _to_numpy(t: Any) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (cpu) without importing torch at module scope
    if hasattr(t, "detach"):
        t = t.detach()
    if hasattr(t, "cpu"):
        t = t.cpu()
    if hasattr(t, "float") and str(getattr(t, "dtype", "")) == "torch.bfloat16":
        t = t.float()
    if hasattr(t, "numpy"):
        return t.numpy()
    return np.asarray(t)


def _set(tree: Dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def convert_qwen2_state_dict(
    state_dict: Mapping[str, Any],
    cfg: Qwen2Config,
    prefix: str = "model.",
    dtype: Any = np.float32,
) -> Dict:
    """Convert an HF Qwen2(ForCausalLM) state dict to our Flax param tree.

    ``prefix`` is the HF name prefix of the decoder ("model." for a plain
    Qwen2ForCausalLM; "model." also inside llava_qwen2 checkpoints where the
    decoder lives at the top level next to ``model.vision_tower.*``).
    """
    sd = {k: v for k, v in state_dict.items()}
    params: Dict = {}

    def grab(name: str) -> np.ndarray:
        return _to_numpy(sd[name]).astype(dtype)

    _set(params, ("model", "embed_tokens", "embedding"), grab(prefix + "embed_tokens.weight"))
    _set(params, ("model", "norm", "weight"), grab(prefix + "norm.weight"))

    layer_param_specs = [
        # (hf suffix, flax path under layer, transpose?)
        ("input_layernorm.weight", ("input_layernorm", "weight"), False),
        ("post_attention_layernorm.weight", ("post_attention_layernorm", "weight"), False),
        ("self_attn.q_proj.weight", ("self_attn", "q_proj", "kernel"), True),
        ("self_attn.q_proj.bias", ("self_attn", "q_proj", "bias"), False),
        ("self_attn.k_proj.weight", ("self_attn", "k_proj", "kernel"), True),
        ("self_attn.k_proj.bias", ("self_attn", "k_proj", "bias"), False),
        ("self_attn.v_proj.weight", ("self_attn", "v_proj", "kernel"), True),
        ("self_attn.v_proj.bias", ("self_attn", "v_proj", "bias"), False),
        ("self_attn.o_proj.weight", ("self_attn", "o_proj", "kernel"), True),
        ("mlp.gate_proj.weight", ("mlp", "gate_proj", "kernel"), True),
        ("mlp.up_proj.weight", ("mlp", "up_proj", "kernel"), True),
        ("mlp.down_proj.weight", ("mlp", "down_proj", "kernel"), True),
    ]

    num_layers = cfg.num_hidden_layers
    for suffix, flax_path, transpose in layer_param_specs:
        per_layer = []
        for i in range(num_layers):
            w = grab(f"{prefix}layers.{i}.{suffix}")
            if transpose:
                w = w.T
            per_layer.append(w)
        if cfg.scan_layers:
            _set(params, ("model", "layers") + flax_path, np.stack(per_layer, axis=0))
        else:
            for i, w in enumerate(per_layer):
                _set(params, ("model", f"layers_{i}") + flax_path, w)

    if not cfg.tie_word_embeddings:
        lm_head_key = "lm_head.weight"
        if lm_head_key in sd:
            _set(params, ("lm_head", "kernel"), grab(lm_head_key).T)

    return params


def fold_conv_bn(
    conv_w: np.ndarray,  # (O, I/g, kH, kW) torch layout
    conv_b: np.ndarray | None,
    bn_gamma: np.ndarray,
    bn_beta: np.ndarray,
    bn_mean: np.ndarray,
    bn_var: np.ndarray,
    eps: float = 1e-5,
) -> tuple[np.ndarray, np.ndarray]:
    """Fold a BatchNorm into the preceding conv (inference reparameterization).

    Returns (folded_w, folded_b) still in torch (O, I/g, kH, kW) layout. This
    is the standard RepVGG/MobileOne fold: w' = w * gamma/sqrt(var+eps),
    b' = beta + (b - mean) * gamma/sqrt(var+eps).
    """
    std = np.sqrt(bn_var + eps)
    scale = bn_gamma / std
    folded_w = conv_w * scale[:, None, None, None]
    bias = conv_b if conv_b is not None else np.zeros_like(bn_mean)
    folded_b = bn_beta + (bias - bn_mean) * scale
    return folded_w, folded_b


def torch_conv_to_flax(w: np.ndarray) -> np.ndarray:
    """(O, I/g, kH, kW) torch conv kernel -> (kH, kW, I/g, O) flax layout."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_fastvithd_state_dict(state_dict, vision_cfg, dtype=np.float32):
    """Convert Apple's FastViTHD tower weights (train-mode multi-branch or
    inference-mode fused) to our fused Flax layout.

    Fold math is exact and unit-tested (``tests/test_reparam.py``,
    ``tests/test_vision_convert.py``); the module-name mapping is a
    reconstruction of the public ml-fastvlm layout awaiting validation
    against a real checkpoint (``io/vision_convert.py`` docstring). Raises
    KeyError on unmatched names so the loader can fall back gracefully.
    """
    from .vision_convert import convert_vision_tower

    return convert_vision_tower(state_dict, vision_cfg, dtype=dtype)
