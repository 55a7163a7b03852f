"""KV-cached autoregressive generation for the FastVLM VLM.

The reference never generates text — its backbone only pools hidden states —
but the underlying llava_qwen2 checkpoint is a full VLM; a complete framework
exposes the captioning/instruct path. TPU structure:

- one jitted **prefill** (image encode + splice + full-sequence decode into a
  preallocated KV cache),
- one jitted **decode step** reused ``max_new_tokens`` times via
  ``lax.scan`` — a single compiled program for the whole generation, no
  per-token dispatch or retrace (static shapes throughout).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.fastvlm import FastVLM, FastVLMConfig
from ..models.qwen2 import init_kv_cache


def build_cache(cfg: FastVLMConfig, batch: int, prompt_len: int, max_new_tokens: int):
    max_len = cfg.num_image_tokens + prompt_len + max_new_tokens
    return init_kv_cache(cfg.text, batch, max_len)


@partial(
    jax.jit,
    static_argnums=(0,),
    static_argnames=(
        "max_new_tokens", "temperature", "top_p", "return_last_logits"
    ),
)
def generate(
    model: FastVLM,
    params,
    images: Optional[jnp.ndarray],
    input_ids: jnp.ndarray,  # (B, T) right-padded
    attention_mask: jnp.ndarray,  # (B, T)
    *,
    max_new_tokens: int = 32,
    eos_token_id: int = 2,
    temperature: float = 0.0,
    top_p: float = 1.0,
    rng: Optional[jax.Array] = None,
    return_last_logits: bool = False,
    lora=None,
) -> jnp.ndarray:
    """Greedy (or temperature) decoding. Returns (B, max_new_tokens) ids,
    padded with ``eos_token_id`` after each sequence finishes.
    ``return_last_logits=True`` additionally returns the final decode
    step's (B, V) logits (numeric-drift probe for quantized caches).
    ``lora``: optional adapter collection (``io/lora.py``) — a single
    adapter tree, or a ``stack_loras`` + ``lora_with_ids`` tree selecting
    one adapter per batch row (multi-LoRA)."""
    b, t = input_ids.shape
    cache = build_cache(model.cfg, b, t, max_new_tokens)
    variables = {"params": params}
    if lora is not None:
        variables["lora"] = lora

    last_logits, _, cache, _, _ = model.apply(
        variables,
        images,
        input_ids,
        attention_mask,
        cache,
        method=FastVLM.prefill,
    )

    if rng is None:
        rng = jax.random.PRNGKey(0)

    from .sampling import sample_tokens

    def sample(logits, key):
        return sample_tokens(logits, key, temperature, top_p)

    rng, key0 = jax.random.split(rng)
    token0 = sample(last_logits, key0).astype(jnp.int32)  # (B,)
    done0 = token0 == eos_token_id

    def step(carry, key):
        token, done, cache, _ = carry
        logits, cache = model.apply(
            variables,
            token[:, None],
            cache,
            method=FastVLM.decode_step,
        )
        next_token = sample(logits, key).astype(jnp.int32)
        next_token = jnp.where(done, eos_token_id, next_token)
        done = jnp.logical_or(done, next_token == eos_token_id)
        return (next_token, done, cache, logits), token

    keys = jax.random.split(rng, max_new_tokens)
    (_, _, _, last), tokens = jax.lax.scan(
        step, (token0, done0, cache, jnp.zeros_like(last_logits)), keys
    )
    if return_last_logits:
        return tokens.T, last
    return tokens.T  # (B, max_new_tokens)
