"""Speculative decoding over the PAGED continuous-batching server.

Composes the two serving levers that matter for decode-bound deployments
(7B int8/int4 on one v5e chip, BASELINE.md): paged KV (persistent HBM
scales with allocated tokens; ``serving/paged_kv.py``) and draft-verify
decode ticks (each target weight-stream pays for ``accepted + 1`` tokens;
``serving/speculative.py``). vLLM composes the same pair; no reference
counterpart (the reference has no serving path at all — one eager forward
per env step, reference ``lerobot_fastvla/modeling_fastvla.py:113-125``).

Structure per tick (ONE compiled program, ONE host fetch — the packed
(B, k+2) contract of ``_speculative_round``):

- the draft (its own small DENSE cache — at 0.5B-draft/7B-target shapes the
  draft cache is ~2% of the target pool, so paging it buys nothing) scans
  ``k + 1`` decode steps;
- the target verifies the ``[last, d_1..d_k]`` window against the page pool
  READ-ONLY (``FastVLM.verify_step_paged``: W slot-causal queries through
  ``ops/attention.paged_attention``'s gathered-window path — a multi-query
  Pallas kernel exists but measured a wash-to-loss vs the gather, which
  amortizes over the k+1 queries, so it is opt-in:
  ``FASTVLM_PAGED_WINDOW_KERNEL=1``; the single-query Pallas kernel stays
  the plain tick's measured-better decode path);
- the window's k+1 K/V rows scatter into each slot's pages at positions
  ``length .. length + k``;
- acceptance (greedy prefix-match or rejection sampling — both modes of
  ``serving/speculative.py``) picks ``a``; the HOST rolls back the rejected
  suffix by advancing its slot masks/lengths only ``a + 1`` positions —
  stale written rows stay masked and are overwritten by the next window at
  the same positions (page cursors are host state, so no in-program cache
  rewind is needed on the target side at all).

Admission prefills BOTH models: the target through the parent's paged
admission (batched misses, prefix-cache hits, chunked prefill — all
inherited), the draft through a dense batched prefill + slot insert. Under
chunked admission the draft prefill runs WHOLE at finalize time — chunking
exists to bound the TARGET's admission stall, and the draft's prefill is
the cheap side by construction (documented divergence from strict
chunk-pacing; PARITY.md lists it).

Exactness: at ``temperature == 0`` outputs are token-identical to the plain
``PagedGenerationServer`` (and the dense servers) on the target model alone
— pinned request-for-request in ``tests/test_speculative_paged.py``, CPU
bit-exact, TPU modulo the bf16 argmax-tie caveat (``serving/speculative.py``
module docstring). At ``temperature > 0`` the emitted stream follows the
target's sampling distribution exactly (rejection-sampling verification,
statistically pinned at the generator level).
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..models.fastvlm import FastVLM
from ..models.qwen2 import init_kv_cache
from .continuous_batching import _Pending, make_slot_insert  # type: ignore
from .paged_kv import PagedGenerationServer
from .speculative import _accept, _draft_propose, validate_draft_pair


@partial(
    jax.jit,
    static_argnums=(0, 1),
    static_argnames=("k", "page", "temperature", "top_p"),
    donate_argnums=(4, 9),  # pools, draft_cache
)
def _paged_speculative_round(
    target: FastVLM,
    draft: FastVLM,
    target_params,
    draft_params,
    pools: dict,  # page pools {"k","v"[, "k_scale","v_scale"]}
    tables: jnp.ndarray,  # (B, P_slot) page tables (trash row appended)
    masks: jnp.ndarray,  # (B, S_max) stored-position validity
    lengths: jnp.ndarray,  # (B,) slot write cursors
    token: jnp.ndarray,  # (B,) last accepted token per row
    draft_cache: dict,  # dense draft cache (B rows)
    active: jnp.ndarray,  # (B,) rows still generating
    key,
    target_lora=None,  # adapters on the TARGET's verify only (draft = base)
    *,
    k: int,
    page: int,
    temperature: float = 0.0,
    top_p: float = 1.0,
):
    """One draft-verify round against the page pool.

    Returns ``(packed (B, k+2), new_pools, new_draft_cache)`` — emitted
    tokens + per-row counts in one int32 array (single host fetch). The
    pool receives the FULL k+1-row window per slot; the host masks validity
    to the accepted prefix (see module docstring).
    """
    b = token.shape[0]
    draft_key, accept_key = (
        jax.random.split(key) if temperature > 0.0 else (key, key)
    )

    dtoks, dlogits, draft_cache = _draft_propose(
        draft, draft_params, draft_cache, token, draft_key,
        k=k, temperature=temperature, top_p=top_p,
    )

    window = jnp.concatenate([token[:, None], dtoks], axis=1)  # (B, k+1)
    cache = {
        "pool_k": pools["k"],
        "pool_v": pools["v"],
        "tables": tables,
        "mask": masks,
        "index": lengths,
    }
    quantized = "k_scale" in pools
    if quantized:
        cache["pool_k_scale"] = pools["k_scale"]
        cache["pool_v_scale"] = pools["v_scale"]
    variables = {"params": target_params}
    if target_lora is not None:
        variables["lora"] = target_lora
    tlogits, rows = target.apply(
        variables, window, cache,
        method=FastVLM.verify_step_paged,
    )

    a, correction = _accept(
        dtoks, dlogits, tlogits, accept_key,
        temperature=temperature, top_p=top_p,
    )
    idx = jnp.arange(k + 1, dtype=jnp.int32)[None, :]
    padded = jnp.concatenate([dtoks, jnp.zeros((b, 1), jnp.int32)], axis=1)
    emitted = jnp.where(idx < a[:, None], padded, correction[:, None])
    count = jnp.where(active, a + 1, 0)

    # Scatter the window's K/V rows into the pools, one window position per
    # static step (k is small). Inactive rows' tables are all-trash, so
    # their writes land in page 0 and are never read.
    rows_b = jnp.arange(b)
    out = dict(pools)
    for j in range(k + 1):
        pos = lengths + j
        page_ids = tables[rows_b, pos // page]
        offsets = pos % page
        out["k"] = out["k"].at[:, page_ids, :, offsets].set(
            jnp.moveaxis(rows["k_rows"][:, :, j], 0, 1).astype(out["k"].dtype)
        )
        out["v"] = out["v"].at[:, page_ids, :, offsets].set(
            jnp.moveaxis(rows["v_rows"][:, :, j], 0, 1).astype(out["v"].dtype)
        )
        if quantized:
            out["k_scale"] = out["k_scale"].at[:, page_ids, :, offsets].set(
                jnp.moveaxis(rows["k_scale_rows"][:, :, j], 0, 1)
            )
            out["v_scale"] = out["v_scale"].at[:, page_ids, :, offsets].set(
                jnp.moveaxis(rows["v_scale_rows"][:, :, j], 0, 1)
            )

    # Draft rollback (dense cache): keep the accepted inputs, clamp dead
    # lanes away from the buffer end (serving/speculative.py semantics).
    adv = jnp.where(active, a + 1, 0)
    d_new = draft_cache["index"] - (k + 1) + adv
    s_d = draft_cache["mask"].shape[1]
    d_new = jnp.where(active, d_new, jnp.minimum(d_new, s_d - (k + 1)))
    keep = jnp.arange(s_d, dtype=jnp.int32)[None, :] < d_new[:, None]
    draft_cache = dict(
        draft_cache,
        mask=jnp.logical_and(draft_cache["mask"], keep),
        index=d_new,
    )

    packed = jnp.concatenate([emitted, count[:, None]], axis=1)
    return packed.astype(jnp.int32), out, draft_cache


class SpeculativePagedGenerationServer(PagedGenerationServer):
    """Paged continuous batching with speculative decode ticks.

    Same submit/step/flush surface as ``PagedGenerationServer`` (prompt
    buckets, admission control, prefix caching, chunked prefill, LoRA —
    single or multi-adapter — all inherited); the decode tick is a
    draft-verify round emitting ``accepted_i + 1 in [1, k+1]`` tokens per
    active slot. Adapters mount on the TARGET side only (admission prefill
    + verify; the draft stays base — see
    ``SpeculativeGenerationServer``'s docstring for why that is exact).
    Single-chip (no TP mesh), like the dense speculative server.
    """

    def __init__(
        self,
        model: FastVLM,
        params,
        draft: FastVLM,
        draft_params,
        *,
        k: int = 4,
        **kwargs,
    ) -> None:
        validate_draft_pair(model, draft, k)
        self.k = int(k)
        # Ticks write a k+1 window at the slot cursor before the host rolls
        # the rejected suffix back; reservations and the logical window
        # carry that slack (PagedGenerationServer.cache_slack).
        kwargs["cache_slack"] = self.k + 1
        super().__init__(model, params, **kwargs)
        self.draft = draft
        dcfg = draft.cfg
        self._draft_cache_len = (
            dcfg.num_image_tokens + self.prompt_len + self.max_new_tokens
            + self.k + 1
        )
        # num_slots + 1 rows: the last is the draft's trash row (dummy
        # admission rows land there; the round pads its pool-side arrays
        # with a matching dead lane).
        draft_cache = init_kv_cache(
            dcfg.text, self.num_slots + 1, self._draft_cache_len
        )
        if self.mesh is not None:
            # TP composition: the TARGET's pools/params shard via the parent
            # (gathered-window verify partitions like a plain TP decode);
            # the small draft replicates on every chip (see the dense
            # speculative server's mesh note).
            from jax.sharding import NamedSharding, PartitionSpec

            replicated = NamedSharding(self.mesh, PartitionSpec())
            draft_params = jax.device_put(draft_params, replicated)
            draft_cache = jax.device_put(draft_cache, replicated)
        self.draft_params = draft_params
        self.draft_cache = draft_cache
        bp = self.prefill_batch
        dlen = self._draft_cache_len
        prep = self.image_prep  # same raw-frame prep as the target side

        def draft_prefill(dparams, images, ids, mask):
            if images is not None and prep is not None:
                images = prep(images)
            cache_p = init_kv_cache(dcfg.text, bp, dlen)
            _, _, cache_p, _, _ = draft.apply(
                {"params": dparams}, images, ids, mask, cache_p,
                method=FastVLM.prefill,
            )
            return cache_p

        self._draft_prefill = jax.jit(draft_prefill)
        self._draft_insert = jax.jit(make_slot_insert(bp), donate_argnums=(0,))
        self.spec_tokens_emitted = 0
        self.spec_ticks = 0

    @property
    def tokens_per_tick(self) -> float:
        return self.spec_tokens_emitted / self.spec_ticks if self.spec_ticks else 0.0

    def step_n(self, n: int):
        """See ``SpeculativeGenerationServer.step_n`` — refused (a scanned
        plain decode would desync the draft cache)."""
        raise NotImplementedError(
            "speculative servers amortize decode through draft-verify "
            "rounds; use step() (step_n's scanned plain decode would "
            "desync the draft cache)"
        )

    # -- draft-side admission ------------------------------------------------

    def _draft_admit(self, batch: List[_Pending]) -> None:
        """Prefill the draft on an admitted batch and insert per slot.

        Runs after the target-side admission (miss batch, prefix-cache hit,
        or chunked finalize) so the draft cache always mirrors the prompts
        the target already holds."""
        bp = self.prefill_batch
        n = len(batch)
        width = batch[0].bucket
        ids = np.zeros((bp, width), np.int32)
        mask = np.zeros((bp, width), np.int32)
        ids[n:, 0] = max(self.eos_token_id, 0)
        mask[n:, 0] = 1
        images = None
        if batch[0].images is not None:
            img0 = np.asarray(batch[0].images)
            images = np.zeros((bp,) + img0.shape[1:], img0.dtype)
        slots = np.full(bp, self.num_slots, np.int32)  # default: trash row
        for row, req in enumerate(batch):
            ids[row] = req.input_ids[0]
            mask[row] = req.attention_mask[0]
            if images is not None:
                images[row] = req.images[0]
            slots[row] = req.slot
        dcache_p = self._draft_prefill(
            self.draft_params,
            jnp.asarray(images) if images is not None else None,
            jnp.asarray(ids),
            jnp.asarray(mask),
        )
        self.draft_cache = self._draft_insert(
            self.draft_cache, dcache_p, jnp.asarray(slots)
        )

    def _admit(self, batch: List[_Pending]) -> None:
        super()._admit(batch)
        self._draft_admit(batch)

    def _admit_from_cache(self, req: _Pending) -> None:
        # A prefix-cache hit skips the TARGET prefill (pages installed by
        # reference); the draft still prefills its own prompt rows — the
        # cheap side of the pair, and hits stay well ahead of misses.
        super()._admit_from_cache(req)
        self._draft_admit([req])

    def _admit_partial(self, req: _Pending, m: int) -> None:
        # Page-level partial hit: the target prefills only the tail; the
        # draft (dense cache, no page sharing) prefills its whole prompt.
        super()._admit_partial(req, m)
        self._draft_admit([req])

    def _finalize_inflight(self, inf) -> None:
        # Chunked admission paces the TARGET's prefill; the draft prefills
        # whole at finalize (documented divergence, module docstring).
        super()._finalize_inflight(inf)
        self._draft_admit(inf.batch)

    # -- the speculative tick --------------------------------------------------

    def step(self):
        """Admit pending requests (chunk-paced when configured), then ONE
        draft-verify round across all slots; returns finished outputs."""
        if self.prefill_chunk_tokens:
            self._admission_work()
        else:
            self.flush()
        if any(s.active for s in self._slots):
            k = self.k
            n = self.num_slots
            for i, slot in enumerate(self._slots):
                if slot.active:
                    # Pages for the K/V window this tick writes at
                    # positions length .. length + k.
                    self.pool.allocate(i, slot.length + k + 1)
            # Pool-side arrays pad one dead lane to match the draft cache's
            # trash row; inactive slots ride with all-trash tables, length
            # 1 and a one-hot mask (a fully-masked attention row would be
            # 0/0), exactly like the plain paged tick.
            lengths = np.ones(n + 1, np.int32)
            masks = np.zeros((n + 1, self._max_len), bool)
            tables = np.zeros((n + 1, self.pool.pages_per_slot), np.int32)
            active = np.zeros(n + 1, bool)
            token = np.full(n + 1, max(self.eos_token_id, 0), np.int32)
            for i, slot in enumerate(self._slots):
                if slot.active:
                    lengths[i] = slot.length
                    masks[i] = self._slot_mask[i]
                    tables[i] = self.pool.page_table[i]
                    active[i] = True
                    token[i] = self._pending_token[i]
                else:
                    masks[i, 0] = True
            masks[n, 0] = True
            slot_lora = np.zeros(n + 1, np.int32)
            for i, slot in enumerate(self._slots):
                if slot.active:
                    slot_lora[i] = slot.lora_index
            packed, new_pools, self.draft_cache = _paged_speculative_round(
                self.model, self.draft, self.params, self.draft_params,
                self.pool.pools(), jnp.asarray(tables), jnp.asarray(masks),
                jnp.asarray(lengths), jnp.asarray(token), self.draft_cache,
                jnp.asarray(active), self._next_key(),
                self._lora_arg(slot_lora),
                k=k, page=self.pool.page_size,
                temperature=self.temperature, top_p=self.top_p,
            )
            self.pool.set_pools(new_pools)
            packed_h = np.asarray(packed)  # ONE fetch per tick
            self.spec_ticks += 1
            for i, slot in enumerate(self._slots):
                if not slot.active:
                    continue
                count = int(packed_h[i, k + 1])
                for j in range(count):
                    tok = int(packed_h[i, j])
                    slot.tokens.append(tok)
                    slot.remaining -= 1
                    self.spec_tokens_emitted += 1
                    if tok == self.eos_token_id or slot.remaining <= 0:
                        break
                self._pending_token[i] = slot.tokens[-1]
                if slot.remaining > 0 and slot.tokens[-1] != self.eos_token_id:
                    # Host-side rollback: only the accepted inputs
                    # [last, d_1..d_a] (= count rows) become valid; the
                    # rejected tail stays masked and is overwritten by the
                    # next window at the same positions.
                    self._slot_mask[i, slot.length : slot.length + count] = True
                    slot.length += count
                self._finish_if_done(i)
        finished = self._finished
        self._finished = {}
        return finished
