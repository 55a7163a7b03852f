"""Speculative decoding: a small draft model proposes, the target verifies.

No reference counterpart (the reference never generates text —
``/root/reference/src/vla_fastvlm/fastvlm_adapter.py`` only pools hidden
states); this is TPU-native serving infrastructure in the
draft-verify lineage (PAPERS.md: speculative decoding) for the framework's
decode-bound deployments — e.g. Qwen2-7B int8/int4 on ONE v5e chip
(BASELINE.md), where a decode step streams the whole weight set for one
token. A 0.5B draft proposes ``k`` tokens cheaply; one 7B forward over the
(k+1)-token window verifies them all, so each target weight-stream pays for
``accepted + 1`` tokens instead of one.

Two exactness contracts, by sampling mode:

- ``temperature == 0`` (greedy): emitted tokens are IDENTICAL to the target
  model's own greedy decode (pinned in ``tests/test_speculative.py``) —
  position ``i`` of the verify window attends only to the cache and window
  tokens ``<= i`` (slot-causal bias, ``models/qwen2.py``), so the target's
  argmax after each accepted prefix is read from one forward regardless of
  the rejected suffix. Precision caveat (same as int8-KV's, BASELINE.md
  quality table): "identical" holds at the math level and bit-exactly
  against ``serving.generate`` on CPU; on TPU the verify window and the
  single-token decode are differently-shaped programs whose bf16 MXU
  summation orders differ, so argmax ties within ~bf16 epsilon can resolve
  differently — immaterial for trained models (greedy margins >> epsilon;
  measure with real checkpoints via the agreement probe in
  ``scripts/eval_quant_quality.py``'s style) but visible on random-init
  tiny models whose logits sit in near-ties.
- ``temperature > 0``: standard rejection-sampling verification (Leviathan
  et al.; ``serving/sampling.speculative_accept``) — proposal ``i`` is
  accepted with probability ``min(1, p_i/q_i)`` over the warped
  (temperature + top-p) distributions, the first rejection resamples from
  the residual ``max(p - q, 0)`` — so the emitted stream is distributed
  EXACTLY like plain sampling from the target (statistically pinned in
  ``tests/test_speculative.py``; per-token identity to a particular plain
  run is not defined — the RNG streams differ).

TPU structure (ONE compiled program per round, ONE host fetch per round —
the round returns emitted tokens and counts packed in a single (B, k+2)
array, so a tick costs one dispatch + one device->host round trip, which on
the tunneled PJRT backend is the dominant fixed cost; VERDICT r3 weak #3):

- **draft phase**: ``k + 1`` single-token decode steps under ``lax.scan``
  (the +1 keeps the draft cache covering the full verify window, so an
  all-accepted round needs no separate draft resync);
- **verify phase**: one ``FastVLM.verify_step`` over ``[last, d_1..d_k]``;
- **acceptance**: greedy — ``a = leading matches(draft, target)``; sampled —
  rejection sampling as above; the round emits ``a + 1`` tokens (the
  accepted prefix plus the correction) — always >= 1, so progress is
  guaranteed;
- **rollback**: both caches wrote the full window; rejected positions are
  masked off and the write cursors rewind in-program (stale K/V rows are
  overwritten by later writes and never attended meanwhile). Rows that
  went inactive mid-window additionally clamp their pinned cursor to
  ``cache_len - (k + 1)`` so later rounds' dead-lane window writes can
  never run past the buffer end (advisor r3 finding — previously this
  relied on dynamic_update_slice clamp semantics).

The host loop only routes tokens (like ``serving/continuous_batching.py``);
finished rows keep riding the batch with their cursors pinned.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.fastvlm import FastVLM
from ..models.qwen2 import init_kv_cache
from .continuous_batching import GenerationServer
from .generate import build_cache
from .sampling import sample_tokens, speculative_accept


def validate_draft_pair(target: FastVLM, draft: FastVLM, k: int) -> None:
    """Shared (target, draft, k) validation for every speculative surface."""
    tv = target.cfg.text.vocab_size
    dv = draft.cfg.text.vocab_size
    if tv != dv:
        raise ValueError(
            f"target/draft vocab mismatch ({tv} vs {dv}): speculative "
            "decoding requires a shared tokenizer"
        )
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")


def _rollback(cache: dict, new_index: jnp.ndarray) -> dict:
    """Rewind a dense KV cache to per-row cursors ``new_index``.

    Positions >= the new cursor are masked invalid; their stale K/V stay in
    the buffers (never attended, overwritten by the next writes at the same
    positions). Prompt-padding holes below the cursor keep their False mask
    (the AND never sets bits).
    """
    s = cache["mask"].shape[1]
    keep = jnp.arange(s, dtype=jnp.int32)[None, :] < new_index[:, None]
    out = dict(cache)
    out["mask"] = jnp.logical_and(cache["mask"], keep)
    out["index"] = new_index
    return out


def _draft_propose(
    draft: FastVLM, draft_params, draft_cache: dict, token: jnp.ndarray,
    key, *, k: int, temperature: float, top_p: float,
):
    """k+1 autoregressive draft steps -> (dtoks (B,k), dlogits, new cache).

    ``dlogits`` is ``None`` in greedy mode (acceptance only needs the
    argmax tokens) and the (B, k) proposals' raw logits under sampling
    (the rejection test needs the draft distribution they were drawn
    from). The k+1-th proposal is never verified — the extra step only
    advances the draft cache so a fully-accepted round needs no resync.
    """
    sampled = temperature > 0.0

    def dstep(carry, skey):
        tok, dcache = carry
        logits, dcache = draft.apply(
            {"params": draft_params}, tok[:, None], dcache,
            method=FastVLM.decode_step,
        )
        nxt = sample_tokens(logits, skey, temperature, top_p)
        out = (nxt, logits) if sampled else nxt
        return (nxt, dcache), out

    keys = jax.random.split(key, k + 1) if sampled else jnp.zeros(k + 1)
    (_, draft_cache), outs = jax.lax.scan(
        dstep, (token, draft_cache), keys, length=k + 1
    )
    if sampled:
        dtoks_all, dlogits_all = outs
        dlogits = jnp.swapaxes(dlogits_all[:k], 0, 1)  # (B, k, V)
    else:
        dtoks_all, dlogits = outs, None
    dtoks = dtoks_all[:k].T  # (B, k); the k+1-th proposal is never verified
    return dtoks, dlogits, draft_cache


def _accept(
    dtoks: jnp.ndarray,  # (B, k)
    dlogits,  # (B, k, V) | None (greedy)
    tlogits: jnp.ndarray,  # (B, k+1, V)
    key, *, temperature: float, top_p: float,
):
    """Acceptance rule -> (a (B,) accepted prefix length, correction (B,))."""
    if temperature > 0.0:
        return speculative_accept(
            dtoks, dlogits, tlogits, key, temperature, top_p
        )
    greedy = tlogits.argmax(-1).astype(jnp.int32)  # (B, k+1)
    match = (dtoks == greedy[:, : dtoks.shape[1]]).astype(jnp.int32)
    a = jnp.cumprod(match, axis=1).sum(axis=1)  # (B,) in [0, k]
    correction = jnp.take_along_axis(greedy, a[:, None], axis=1)[:, 0]
    return a, correction


@partial(
    jax.jit,
    static_argnums=(0, 1),
    static_argnames=("k", "temperature", "top_p"),
    donate_argnums=(4, 5),  # target_cache, draft_cache
)
def _speculative_round(
    target: FastVLM,
    draft: FastVLM,
    target_params,
    draft_params,
    target_cache: dict,
    draft_cache: dict,
    token: jnp.ndarray,  # (B,) last accepted token per row
    active: jnp.ndarray,  # (B,) rows still generating (cursor-pinned else)
    key,  # PRNG key (unused at temperature 0)
    target_lora=None,  # adapters on the TARGET's verify only (draft = base)
    *,
    k: int,
    temperature: float = 0.0,
    top_p: float = 1.0,
):
    """One draft-verify round -> (packed (B, k+2), caches, next_token).

    ``packed[:, :k+1]`` are the round's emitted tokens in target order and
    ``packed[:, k+1]`` the per-row count — one int32 array so the host pays
    a single fetch per round; inactive rows emit nothing (count 0) and
    their caches do not advance.

    ``target_lora``: optional adapter tree (``io/lora.py``; per-row ids
    mounted for multi-LoRA) applied to the TARGET's verify forward. The
    draft never needs adapters: greedy acceptance compares proposals to the
    adapted target's argmax, and rejection sampling only requires the
    TARGET distribution ``p`` to be exact — a base-model draft ``q`` just
    shifts the acceptance rate, never the emitted distribution.
    """
    b = token.shape[0]
    draft_key, accept_key = (
        jax.random.split(key) if temperature > 0.0 else (key, key)
    )

    dtoks, dlogits, draft_cache = _draft_propose(
        draft, draft_params, draft_cache, token, draft_key,
        k=k, temperature=temperature, top_p=top_p,
    )

    # --- verify: one target forward over [last, d_1..d_k].
    window = jnp.concatenate([token[:, None], dtoks], axis=1)  # (B, k+1)
    variables = {"params": target_params}
    if target_lora is not None:
        variables["lora"] = target_lora
    tlogits, target_cache = target.apply(
        variables, window, target_cache,
        method=FastVLM.verify_step,
    )

    a, correction = _accept(
        dtoks, dlogits, tlogits, accept_key,
        temperature=temperature, top_p=top_p,
    )

    # Emitted = accepted draft prefix + the correction token.
    idx = jnp.arange(k + 1, dtype=jnp.int32)[None, :]
    padded = jnp.concatenate([dtoks, jnp.zeros((b, 1), jnp.int32)], axis=1)
    emitted = jnp.where(idx < a[:, None], padded, correction[:, None])
    count = jnp.where(active, a + 1, 0)

    # --- rollback: both caches wrote the full (k+1) window; keep the
    # accepted inputs [last, d_1..d_a] (a+1 rows) and rewind the rest.
    # Inactive rows rewind the whole window AND clamp to cache_len-(k+1):
    # a row that finished mid-window abandons accepted rows, so its pinned
    # cursor could otherwise sit close enough to the end that later rounds'
    # dead-lane writes run past the buffer (advisor r3 finding).
    adv = jnp.where(active, a + 1, 0)
    t_new = target_cache["index"] - (k + 1) + adv
    d_new = draft_cache["index"] - (k + 1) + adv
    s_t = target_cache["mask"].shape[1]
    s_d = draft_cache["mask"].shape[1]
    t_new = jnp.where(active, t_new, jnp.minimum(t_new, s_t - (k + 1)))
    d_new = jnp.where(active, d_new, jnp.minimum(d_new, s_d - (k + 1)))
    target_cache = _rollback(target_cache, t_new)
    draft_cache = _rollback(draft_cache, d_new)

    next_token = jnp.where(active, correction, token)
    packed = jnp.concatenate([emitted, count[:, None]], axis=1)
    return packed.astype(jnp.int32), target_cache, draft_cache, next_token


class SpeculativeGenerator:
    """Speculative decoding over a (target, draft) FastVLM pair.

    Both models must share the tokenizer/vocab; the draft may differ in
    every other dimension (the 0.5B-draft/7B-target pairing is the design
    point). ``k`` is the draft lookahead per round; per-round cost is
    ``(k+1) x draft_step + 1 x target_verify(k+1)``, per-round yield is
    ``accepted + 1 in [1, k+1]`` tokens — the break-even acceptance rate
    for a given pair is measured by ``scripts/bench_speculative.py``.
    ``temperature == 0`` emits the target's exact greedy tokens;
    ``temperature > 0`` emits tokens distributed exactly like plain
    sampling from the target (rejection-sampling verification).
    """

    def __init__(
        self,
        target: FastVLM,
        target_params,
        draft: FastVLM,
        draft_params,
        *,
        k: int = 4,
        eos_token_id: int = 2,
        temperature: float = 0.0,
        top_p: float = 1.0,
        seed: int = 0,
    ):
        validate_draft_pair(target, draft, k)
        self.target, self.target_params = target, target_params
        self.draft, self.draft_params = draft, draft_params
        self.k = int(k)
        self.eos_token_id = int(eos_token_id)
        self.temperature = float(temperature)
        self.top_p = float(top_p)
        self._base_key = jax.random.PRNGKey(seed)

    def generate(
        self,
        images: Optional[jnp.ndarray],
        input_ids: jnp.ndarray,  # (B, T) right-padded
        attention_mask: jnp.ndarray,  # (B, T)
        *,
        max_new_tokens: int = 32,
    ) -> np.ndarray:
        """Decode -> (B, max_new_tokens) ids, eos-padded after each row
        finishes. Token-identical to ``serving.generate`` at
        ``temperature=0`` on the target model alone; distribution-identical
        to it at ``temperature > 0``."""
        b, t = input_ids.shape
        k = self.k
        # Cache slack: every round writes k+1 positions before rolling the
        # rejected suffix back, so the high-water mark is the accepted
        # length plus one full window.
        target_cache = build_cache(self.target.cfg, b, t, max_new_tokens + k + 1)
        draft_cache = build_cache(self.draft.cfg, b, t, max_new_tokens + k + 1)

        t_logits, target_cache = self._prefill(
            self.target, self.target_params, target_cache,
            images, input_ids, attention_mask,
        )
        _, draft_cache = self._prefill(
            self.draft, self.draft_params, draft_cache,
            images, input_ids, attention_mask,
        )
        counter = 0
        token = sample_tokens(
            t_logits, jax.random.fold_in(self._base_key, counter),
            self.temperature, self.top_p,
        )

        out = np.full((b, max_new_tokens), self.eos_token_id, np.int64)
        lengths = np.zeros(b, np.int64)
        # The prefill's own token is the first emission.
        first = np.asarray(token)
        for row in range(b):
            out[row, 0] = first[row]
            lengths[row] = 1
        done = (first == self.eos_token_id) | (max_new_tokens <= 1)

        while not done.all():
            counter += 1
            active = jnp.asarray(~done)
            packed, target_cache, draft_cache, token = _speculative_round(
                self.target, self.draft,
                self.target_params, self.draft_params,
                target_cache, draft_cache, token, active,
                jax.random.fold_in(self._base_key, counter),
                k=k, temperature=self.temperature, top_p=self.top_p,
            )
            packed_h = np.asarray(packed)  # ONE fetch per round
            for row in range(b):
                if done[row]:
                    continue
                for j in range(int(packed_h[row, k + 1])):
                    tok = int(packed_h[row, j])
                    out[row, lengths[row]] = tok
                    lengths[row] += 1
                    if tok == self.eos_token_id or lengths[row] >= max_new_tokens:
                        done[row] = True
                        break
        return out

    @staticmethod
    def _prefill(model, params, cache, images, input_ids, attention_mask):
        logits, _, cache, _, _ = model.apply(
            {"params": params}, images, input_ids, attention_mask, cache,
            method=FastVLM.prefill,
        )
        return logits, cache


class SpeculativeGenerationServer(GenerationServer):
    """Continuous batching with speculative decode ticks (vLLM-style).

    The dense slot server (``serving/continuous_batching.py``) with its
    decode tick replaced by a draft-verify round across ALL occupied slots:
    one tick emits ``accepted_i + 1 in [1, k+1]`` tokens per slot instead of
    one, so decode-bound deployments (7B int8/int4 on one chip, BASELINE.md)
    amortize each target weight-stream over several tokens while keeping
    admission-any-time semantics. At ``temperature == 0`` outputs are
    token-identical to the plain ``GenerationServer`` on the target model
    alone (pinned in ``tests/test_speculative.py``; bf16-tie caveat in the
    module docstring applies on TPU); at ``temperature > 0`` they follow the
    target's sampling distribution exactly (rejection-sampling
    verification).

    Structure per tick (two compiled programs, static shapes):

    - the shared ``_speculative_round`` runs over the slot axis
      (``num_slots + 1`` rows incl. the trash slot) with an ``active`` mask:
      inactive rows ride the batch with their cache cursors pinned (the
      round rewinds their whole window), exactly like the dense server's
      finished slots ride its decode program;
    - admission prefills BOTH caches (target logits seed the first token;
      the draft prefill is cache-only) and inserts each into its slot cache
      through the shared donated ``insert`` program.

    Per-slot EOS / token-budget truncation happens on the host: a slot that
    finishes mid-window simply abandons its extra accepted cache rows — the
    next admission's insert overwrites the whole slot row, so no rollback
    is needed beyond the round's own (which also clamps the dead lane's
    cursor away from the buffer end).

    LoRA adapters (``lora=``, single or multi with per-request
    ``submit(lora_index=...)``) mount on the TARGET side only — admission
    prefill and the round's verify forward; the draft stays the base model
    (greedy compares proposals against the ADAPTED target's argmax;
    rejection sampling needs only the target distribution to be exact, so
    un-adapted proposals just lower acceptance, never correctness; pinned
    token-exact vs the plain LoRA server in ``tests/test_lora_serving.py``).

    ``mesh``: optional TP mesh — the TARGET's params and KV cache shard
    exactly like the plain server's (``parallel/sharding``), and GSPMD
    partitions the round program from its input shardings: the verify
    forward runs tensor-parallel (kv heads over ``model``, the same
    collectives as a plain decode tick) while the small draft runs
    replicated on every chip — redundant by design, since a 0.5B draft step
    is ~5 ms against a 7B TP verify and replicating it avoids cross-model
    resharding inside the round. Token-exact vs the single-device server
    (``tests/test_speculative.py``). The PAGED counterpart is
    ``serving/speculative_paged.py``.
    """

    def __init__(
        self,
        model: FastVLM,
        params,
        draft: FastVLM,
        draft_params,
        *,
        k: int = 4,
        num_slots: int = 8,
        prompt_len=64,
        max_new_tokens: int = 32,
        eos_token_id: int = 2,
        prefill_batch: int = 4,
        temperature: float = 0.0,
        top_p: float = 1.0,
        seed: int = 0,
        lora=None,
        mesh=None,
    ) -> None:
        validate_draft_pair(model, draft, k)
        self.k = int(k)
        super().__init__(
            model,
            params,
            num_slots=num_slots,
            prompt_len=prompt_len,
            max_new_tokens=max_new_tokens,
            eos_token_id=eos_token_id,
            prefill_batch=prefill_batch,
            temperature=temperature,
            top_p=top_p,
            seed=seed,
            lora=lora,
            mesh=mesh,
            # Rounds write a k+1 window before rolling the rejected suffix
            # back; the high-water mark is accepted length + one window.
            cache_slack=self.k + 1,
        )
        self.draft = draft
        dcfg = draft.cfg
        self._draft_cache_len = (
            dcfg.num_image_tokens + self.prompt_len + max_new_tokens
            + self.k + 1
        )
        draft_cache = init_kv_cache(
            dcfg.text, num_slots + 1, self._draft_cache_len
        )
        if mesh is not None:
            # Replicate the draft on the mesh (params AND cache): every chip
            # runs the cheap draft scan redundantly, no collectives.
            from jax.sharding import NamedSharding, PartitionSpec

            replicated = NamedSharding(mesh, PartitionSpec())
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
        # Acceptance observability: tokens emitted by speculative ticks and
        # the tick count — ``tokens_per_tick`` is the live amortization
        # factor (1.0 = no draft tokens accepted; k+1 = full acceptance).
        self.spec_tokens_emitted = 0
        self.spec_ticks = 0

    @property
    def tokens_per_tick(self) -> float:
        return self.spec_tokens_emitted / self.spec_ticks if self.spec_ticks else 0.0

    def step_n(self, n: int):
        """A speculative tick already emits up to ``k + 1`` tokens; the
        inherited scanned plain-decode would advance the target cache
        without the draft cache (desync). Refuse rather than silently run
        non-speculative ticks."""
        raise NotImplementedError(
            "speculative servers amortize decode through draft-verify "
            "rounds; use step() (step_n's scanned plain decode would "
            "desync the draft cache)"
        )

    def _admit(self, batch) -> None:
        ids, mask, images, slots, row_lora = self._assemble_admission(batch)
        imgs = jnp.asarray(images) if images is not None else None
        ids_j, mask_j = jnp.asarray(ids), jnp.asarray(mask)
        first_tokens, cache_p = self._prefill(
            self.params, imgs, ids_j, mask_j, self._next_key(),
            self._lora_arg(row_lora),  # adapters: target side only
        )
        dcache_p = self._draft_prefill(self.draft_params, imgs, ids_j, mask_j)
        slots_j = jnp.asarray(slots)
        # The shared donated insert program retraces per cache shape, so it
        # serves both the target and draft slot caches.
        self.cache = self._insert(self.cache, cache_p, slots_j)
        self.draft_cache = self._insert(self.draft_cache, dcache_p, slots_j)
        self._register_admitted(batch, slots, np.asarray(first_tokens))

    def step(self):
        """Admit pending requests, then ONE speculative round across all
        slots (emitting up to ``k + 1`` tokens per active slot); returns
        finished request outputs."""
        self.flush()
        if any(s.active for s in self._slots):
            active_h = np.zeros(self.num_slots + 1, bool)
            slot_lora = np.zeros(self.num_slots + 1, np.int32)
            for i, s in enumerate(self._slots):
                active_h[i] = s.active
                if s.active:
                    slot_lora[i] = s.lora_index
            packed, self.cache, self.draft_cache, _ = _speculative_round(
                self.model, self.draft,
                self.params, self.draft_params,
                self.cache, self.draft_cache,
                jnp.asarray(self._pending_token),
                jnp.asarray(active_h),
                self._next_key(),
                self._lora_arg(slot_lora),
                k=self.k, temperature=self.temperature, top_p=self.top_p,
            )
            packed_h = np.asarray(packed)  # ONE fetch per tick
            self.spec_ticks += 1
            for i, slot in enumerate(self._slots):
                if not slot.active:
                    continue
                for j in range(int(packed_h[i, self.k + 1])):
                    tok = int(packed_h[i, j])
                    slot.tokens.append(tok)
                    slot.remaining -= 1
                    self.spec_tokens_emitted += 1
                    if tok == self.eos_token_id or slot.remaining <= 0:
                        break
                self._pending_token[i] = slot.tokens[-1]
                self._finish_if_done(i)

        finished = self._finished_buffer
        self._finished_buffer = {}
        return finished
