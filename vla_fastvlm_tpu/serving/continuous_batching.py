"""Continuous-batching generation server (BASELINE.json config #5 direction).

Slot-based continuous batching over the FastVLM KV cache: requests prefill
into a free slot as they arrive while decode ticks run across ALL slots in
one jitted program — no waiting for a full batch and no head-of-line blocking
by long generations. This is the standard TPU serving shape: three compiled
programs total (single-request prefill, slot insert, batched decode tick),
everything static-shape, slot state tracked on the host.

Relies on the per-example cache cursors in ``models/qwen2.py`` (each slot's
write position advances independently).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.fastvlm import FastVLM
from ..models.qwen2 import init_kv_cache


@dataclasses.dataclass
class _Slot:
    request_id: int = -1
    active: bool = False
    tokens: List[int] = dataclasses.field(default_factory=list)
    remaining: int = 0


class GenerationServer:
    """Admit requests any time; tick decode across all occupied slots."""

    def __init__(
        self,
        model: FastVLM,
        params,
        num_slots: int = 8,
        prompt_len: int = 64,
        max_new_tokens: int = 32,
        eos_token_id: int = 2,
    ) -> None:
        self.model = model
        self.params = params
        self.num_slots = num_slots
        self.prompt_len = prompt_len
        self.max_new_tokens = max_new_tokens
        self.eos_token_id = eos_token_id

        cfg = model.cfg
        self._cache_len = cfg.num_image_tokens + prompt_len + max_new_tokens
        self.cache = init_kv_cache(cfg.text, num_slots, self._cache_len)
        self._slots = [_Slot() for _ in range(num_slots)]
        self._next_rid = 0
        self._pending_token = np.full(num_slots, eos_token_id, np.int32)
        self._finished_buffer: Dict[int, List[int]] = {}

        def prefill_one(params, images, ids, mask):
            cache1 = init_kv_cache(cfg.text, 1, self._cache_len)
            last_logits, _, cache1, _, _ = model.apply(
                {"params": params}, images, ids, mask, cache1,
                method=FastVLM.prefill,
            )
            return jnp.argmax(last_logits, axis=-1).astype(jnp.int32), cache1

        def insert(cache, cache1, slot):
            def put(buf, new):
                if buf.ndim >= 4:  # (L, B, S, ...) k/v
                    start = (0, slot) + (0,) * (buf.ndim - 2)
                    return jax.lax.dynamic_update_slice(buf, new, start)
                if buf.ndim == 2:  # (B, S) mask
                    return jax.lax.dynamic_update_slice(buf, new, (slot, 0))
                return jax.lax.dynamic_update_slice(buf, new, (slot,))  # (B,) index

            return jax.tree_util.tree_map(put, cache, cache1)

        def decode(params, tokens, cache):
            logits, cache = model.apply(
                {"params": params}, tokens[:, None], cache,
                method=FastVLM.decode_step,
            )
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

        self._prefill = jax.jit(prefill_one)
        self._insert = jax.jit(insert)
        self._decode = jax.jit(decode)

    # ------------------------------------------------------------------

    def has_free_slot(self) -> bool:
        return any(not s.active for s in self._slots)

    @property
    def num_active(self) -> int:
        return sum(s.active for s in self._slots)

    def submit(
        self,
        input_ids: np.ndarray,  # (T,) or (1, T), right-padded to prompt_len
        attention_mask: np.ndarray,
        images: Optional[np.ndarray] = None,  # (1, 3, S, S) when multimodal
    ) -> int:
        """Prefill into a free slot; returns a request id."""
        slot_idx = next(
            (i for i, s in enumerate(self._slots) if not s.active), None
        )
        if slot_idx is None:
            raise RuntimeError("no free generation slots")
        ids = jnp.asarray(np.atleast_2d(input_ids), jnp.int32)
        mask = jnp.asarray(np.atleast_2d(attention_mask), jnp.int32)
        if ids.shape[1] != self.prompt_len:
            raise ValueError(
                f"prompt must be padded to prompt_len={self.prompt_len}, "
                f"got {ids.shape[1]}"
            )
        first_token, cache1 = self._prefill(self.params, images, ids, mask)
        self.cache = self._insert(self.cache, cache1, slot_idx)

        rid = self._next_rid
        self._next_rid += 1
        slot = self._slots[slot_idx]
        slot.request_id = rid
        slot.active = True
        slot.tokens = [int(first_token[0])]
        slot.remaining = self.max_new_tokens - 1
        self._pending_token[slot_idx] = int(first_token[0])
        self._finish_if_done(slot_idx)
        return rid

    def _finish_if_done(self, slot_idx: int) -> None:
        slot = self._slots[slot_idx]
        if not slot.active:
            return
        done = slot.remaining <= 0 or (
            slot.tokens and slot.tokens[-1] == self.eos_token_id
        )
        if not done:
            return
        slot.active = False
        self._pending_token[slot_idx] = self.eos_token_id
        self._finished_buffer[slot.request_id] = list(slot.tokens)

    def step(self) -> Dict[int, List[int]]:
        """One decode tick across all slots; returns finished request outputs
        (including any that completed at submit time)."""
        if self.num_active > 0:
            tokens = jnp.asarray(self._pending_token)
            next_tokens, self.cache = self._decode(self.params, tokens, self.cache)
            next_host = np.asarray(next_tokens)

            for i, slot in enumerate(self._slots):
                if not slot.active:
                    continue
                token = int(next_host[i])
                slot.tokens.append(token)
                slot.remaining -= 1
                self._pending_token[i] = token
                self._finish_if_done(i)

        finished = self._finished_buffer
        self._finished_buffer = {}
        return finished

    def run_to_completion(self, max_ticks: Optional[int] = None) -> Dict[int, List[int]]:
        """Drain all active slots; convenience for tests/offline use."""
        outputs: Dict[int, List[int]] = {}
        ticks = 0
        while self.num_active and (max_ticks is None or ticks < max_ticks):
            outputs.update(self.step())
            ticks += 1
        outputs.update(self.step())
        return outputs
