"""FastVLM checkpoint/config resolution: the TPU-native ``_load_model``.

Replaces the reference's HF ``AutoModelForCausalLM.from_pretrained(...,
trust_remote_code=True)`` path and its llava_qwen2 bootstrap fallback
(reference ``fastvlm_adapter.py:183-241``) with explicit, offline-capable
rules:

1. ``model_id`` naming a known preset ("apple/FastVLM-0.5B" / 1.5B / 7B or the
   short aliases) -> that architecture; weights random-initialized unless a
   local checkpoint directory is also given (zero-egress environments cannot
   download Apple's zips; ``scripts/download_fastvlm.sh`` fetches them where
   networking exists, mirroring reference ``scripts/download_fastvlm.sh:14-29``).
2. ``model_id`` pointing at a local checkpoint directory with ``config.json``:
   - ``model_type == "llava_qwen2"`` -> full multimodal architecture, field
     defaults borrowed from ``bootstrap_model_id``'s preset when absent — the
     TPU-native restatement of the reference's bootstrap-config borrow
     (``fastvlm_adapter.py:208-241``);
   - ``model_type == "qwen2"`` -> text-only decoder (vision tower defaults).
   Weights are loaded from ``*.safetensors`` when present.

Error-message behavior mirrors the reference: a bootstrap directory whose
``model_type`` is not llava_qwen2 raises RuntimeError with the same meaning
(``fastvlm_adapter.py:220-224``).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.fastvit import fastvithd, fastvithd_tiny
from ..models.fastvlm import FastVLMConfig
from ..models.qwen2 import Qwen2Config, qwen2_0_5b, qwen2_1_5b, qwen2_7b, qwen2_tiny
from .weights import convert_qwen2_state_dict

logger = logging.getLogger(__name__)

# Preset table: HF ids used throughout the reference docs (README.md:87-105)
# plus short aliases for offline use.
_PRESETS = {
    "apple/fastvlm-0.5b": (qwen2_0_5b, 1024),
    "apple/fastvlm-1.5b": (qwen2_1_5b, 1024),
    "apple/fastvlm-7b": (qwen2_7b, 1024),
    "fastvlm-0.5b": (qwen2_0_5b, 1024),
    "fastvlm-1.5b": (qwen2_1_5b, 1024),
    "fastvlm-7b": (qwen2_7b, 1024),
    "llava-fastvithd_0.5b_stage3": (qwen2_0_5b, 1024),
    "llava-fastvithd_1.5b_stage3": (qwen2_1_5b, 1024),
    "llava-fastvithd_7b_stage3": (qwen2_7b, 1024),
    "fastvlm-tiny": (qwen2_tiny, 64),
    "tiny": (qwen2_tiny, 64),
}


def _preset_for(model_id: str) -> Optional[Tuple[Any, int]]:
    return _PRESETS.get(model_id.lower())


def _text_config_from_json(cfg: Dict[str, Any], base: Qwen2Config) -> Qwen2Config:
    """Build a Qwen2Config from an HF config dict, defaulting to ``base``."""
    def get(key, default):
        value = cfg.get(key)
        return default if value is None else value

    return base.replace(
        vocab_size=int(get("vocab_size", base.vocab_size)),
        hidden_size=int(get("hidden_size", base.hidden_size)),
        num_hidden_layers=int(get("num_hidden_layers", base.num_hidden_layers)),
        num_attention_heads=int(get("num_attention_heads", base.num_attention_heads)),
        num_key_value_heads=int(get("num_key_value_heads", base.num_key_value_heads)),
        intermediate_size=int(get("intermediate_size", base.intermediate_size)),
        rope_theta=float(get("rope_theta", base.rope_theta)),
        rms_norm_eps=float(get("rms_norm_eps", base.rms_norm_eps)),
        tie_word_embeddings=bool(get("tie_word_embeddings", base.tie_word_embeddings)),
        max_position_embeddings=int(
            get("max_position_embeddings", base.max_position_embeddings)
        ),
    )


def resolve_fastvlm_config(
    model_id: str,
    bootstrap_model_id: str = "apple/FastVLM-0.5B",
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
    image_token_mode: str = "prefix",
) -> Tuple[FastVLMConfig, Optional[Dict[str, Any]]]:
    """Resolve ``model_id`` to a FastVLMConfig.

    Returns (config, raw_hf_config_dict_or_None). Raises RuntimeError for
    unsupported local checkpoints, ValueError for unknown ids — matching the
    failure modes of reference ``fastvlm_adapter.py:183-241``.
    """
    path = Path(model_id)
    if path.is_dir():
        config_path = path / "config.json"
        if not config_path.is_file():
            raise RuntimeError(
                "Local checkpoint directories must contain config.json. "
                f"Got model_id='{model_id}'."
            )
        with open(config_path, encoding="utf-8") as f:
            raw = json.load(f)

        model_type = raw.get("model_type")
        bootstrap = _preset_for(bootstrap_model_id)
        if bootstrap is not None:
            base_text = bootstrap[0]()
        else:
            base_text = qwen2_0_5b()
            # Bootstrap may itself be a local checkpoint dir (the reference
            # borrows the *config class* from it, ``fastvlm_adapter.py:227``;
            # here we borrow its field values as defaults).
            boot_path = Path(bootstrap_model_id)
            boot_cfg_file = boot_path / "config.json"
            if boot_path.is_dir() and boot_cfg_file.is_file():
                with open(boot_cfg_file, encoding="utf-8") as f:
                    base_text = _text_config_from_json(json.load(f), base_text)

        if model_type == "llava_qwen2":
            text = _text_config_from_json(raw, base_text)
            tower_name = raw.get("mm_vision_tower") or raw.get("vision_tower") or ""
            image_size = infer_size_from_tower_name(tower_name) or (
                bootstrap[1] if bootstrap else 1024
            )
            vision = fastvithd() if text.hidden_size > 256 else fastvithd_tiny()
            cfg = FastVLMConfig(
                vision=vision.replace(dtype=dtype, param_dtype=param_dtype),
                text=text.replace(dtype=dtype, param_dtype=param_dtype),
                image_size=int(image_size),
                image_token_mode=image_token_mode,
            )
            return cfg, raw
        if model_type == "qwen2":
            text = _text_config_from_json(raw, base_text)
            cfg = FastVLMConfig(
                vision=fastvithd(dtype=dtype, param_dtype=param_dtype),
                text=text.replace(dtype=dtype, param_dtype=param_dtype),
                image_token_mode="none",
            )
            return cfg, raw
        raise RuntimeError(
            "Bootstrap fallback was triggered, but the local model_type is not "
            f"llava_qwen2. Got '{model_type}'."
        )

    preset = _preset_for(model_id)
    if preset is None:
        raise ValueError(
            f"Unknown model_id '{model_id}': not a local checkpoint directory "
            "and not a known FastVLM preset. Download a checkpoint with "
            "scripts/download_fastvlm.sh or pass one of: "
            + ", ".join(sorted(set(_PRESETS)))
        )
    text_fn, image_size = preset
    text = text_fn(dtype=dtype, param_dtype=param_dtype)
    vision = (
        fastvithd_tiny(dtype=dtype, param_dtype=param_dtype)
        if text.hidden_size <= 256
        else fastvithd(dtype=dtype, param_dtype=param_dtype)
    )
    cfg = FastVLMConfig(
        vision=vision,
        text=text,
        image_size=image_size,
        image_token_mode=image_token_mode,
    )
    return cfg, None


def infer_size_from_tower_name(tower_name: Any) -> Optional[int]:
    """Parse the input resolution out of a vision-tower name.

    Behavioral parity with reference ``_infer_size_from_tower_name``
    (``fastvlm_adapter.py:300-335``): anchored suffix patterns first
    (``mobileclip_l_1024``, ``...patch14-384``), then the last plausible
    number in [64, 4096] skipping model-scale tokens like ``so400m``.
    """
    import re

    if not isinstance(tower_name, str):
        return None
    name = tower_name.lower()

    for pattern in (
        r"(?:^|[_-])(\d{2,4})$",
        r"patch\d+[-_](\d{2,4})(?:$|[_-])",
    ):
        match = re.search(pattern, name)
        if match is not None:
            value = int(match.group(1))
            if 64 <= value <= 4096:
                return value

    fallback_values = []
    for match in re.finditer(r"(\d{2,4})", name):
        value = int(match.group(1))
        if not (64 <= value <= 4096):
            continue
        suffix = name[match.end(): match.end() + 1]
        if suffix in {"m", "b"}:
            continue
        fallback_values.append(value)
    if fallback_values:
        return fallback_values[-1]
    return None


def _read_safetensors_state(model_dir: Path) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    state: Dict[str, np.ndarray] = {}
    for shard in sorted(model_dir.glob("*.safetensors")):
        with safe_open(str(shard), framework="np") as f:
            for key in f.keys():
                state[key] = f.get_tensor(key)
    return state


def load_fastvlm_params(
    model_dir: str | Path,
    cfg: FastVLMConfig,
    dtype: Any = np.float32,
) -> Optional[Dict]:
    """Load + convert llava_qwen2 safetensors into our Flax param tree.

    Returns None when the directory holds no safetensors (caller then
    random-initializes — the offline path). Decoder and projector weights are
    exact transposes of the HF layout; vision-tower weights require the
    reparameterization fold (``io/weights.py``) and are skipped with a warning
    when the fold cannot match the stored names.
    """
    model_dir = Path(model_dir)
    state = _read_safetensors_state(model_dir)
    if not state:
        logger.warning(
            "No *.safetensors found in %s; model will be randomly initialized.",
            model_dir,
        )
        return None

    params: Dict = {}
    # Decoder: HF llava_qwen2 keeps the Qwen2 stack under "model." at top level
    # (next to model.vision_tower / model.mm_projector).
    decoder = convert_qwen2_state_dict(state, cfg.text, prefix="model.", dtype=dtype)
    params["language_model"] = decoder["model"]
    if "lm_head" in decoder:
        params["lm_head"] = decoder["lm_head"]

    # Projector: llava mlp2x_gelu = Sequential(Linear, GELU, Linear) stored as
    # model.mm_projector.{0,2}.{weight,bias}.
    proj = {}
    for hf_idx, ours in (("0", "fc1"), ("2", "fc2")):
        w_key = f"model.mm_projector.{hf_idx}.weight"
        b_key = f"model.mm_projector.{hf_idx}.bias"
        if w_key in state:
            proj[ours] = {
                "kernel": np.asarray(state[w_key], dtype=dtype).T,
                "bias": np.asarray(state[b_key], dtype=dtype),
            }
    if proj:
        params["mm_projector"] = proj

    vision_keys = [k for k in state if k.startswith("model.vision_tower.")]
    if vision_keys and cfg.image_token_mode != "none":
        from .weights import convert_fastvithd_state_dict

        try:
            params["vision_tower"] = convert_fastvithd_state_dict(
                state, cfg.vision, dtype=dtype
            )
        except KeyError as exc:
            logger.warning(
                "Vision tower weights present but could not be converted (%s); "
                "vision tower will be randomly initialized.",
                exc,
            )
    return params
