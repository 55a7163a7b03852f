"""Continuous-batching generation server (BASELINE.json config #5 direction).

Slot-based continuous batching over the FastVLM KV cache: requests are
admitted any time while decode ticks run across ALL slots in one jitted
program — no waiting for a full batch and no head-of-line blocking by long
generations. TPU serving structure:

- **Batched admission**: ``submit`` only queues host-side; pending requests
  are prefilled ``prefill_batch`` at a time in ONE compiled program at the
  next ``step`` (or explicit ``flush``). Short of a full admission batch the
  same program runs with zero-masked dummy rows — one compiled shape.
- **In-place cache updates**: the slot-insert and decode-tick programs
  donate the cache buffers (``jax.jit(..., donate_argnums=0)``), so XLA
  aliases them instead of round-tripping the full (L, B, S, K, D) cache
  through fresh allocations on every admission/tick.
- **Trash slot**: the cache carries one extra slot that dummy admission rows
  prefill into; it is never decoded from or read back, so no masking logic
  leaks into the compiled programs.

Relies on the per-example cache cursors in ``models/qwen2.py`` (each slot's
write position advances independently). Exactness vs sequential generation
is pinned by ``tests/test_continuous_batching.py`` including an interleaved
submit/tick load test.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

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
    lora_index: int = 0  # internal stacked-adapter index (0 = base)


@dataclasses.dataclass
class _Pending:
    request_id: int
    input_ids: np.ndarray  # (1, bucket)
    attention_mask: np.ndarray  # (1, bucket)
    images: Optional[np.ndarray]  # (1, 3, S, S) | None
    bucket: int = 0  # compiled prompt width this request was padded to
    lora_index: int = 0  # internal stacked-adapter index (0 = base)


def normalize_lora(lora):
    """Server ``lora=`` argument -> ``(tree, multi, num_adapters)``.

    ``None`` (no adapters), a single adapter tree (``io/lora.init_lora`` —
    applied to every request), or a sequence of adapter trees (multi-LoRA:
    stacked with a zeros base adapter at internal index 0; requests pick an
    adapter — or the base — per ``submit``)."""
    if lora is None:
        return None, False, 0
    if isinstance(lora, (list, tuple)):
        from ..io.lora import stack_loras

        return stack_loras(lora, include_base=True), True, len(lora)
    return lora, False, 1


def lora_call_arg(lora, multi: bool, ids):
    """Per-program adapter argument: None / the single tree / the stacked
    tree with this call's per-row adapter indices mounted (multi-LoRA)."""
    if lora is None or not multi:
        return lora
    from ..io.lora import lora_with_ids

    return lora_with_ids(lora, jnp.asarray(ids, jnp.int32))


def resolve_lora_index(multi: bool, num_adapters: int, lora_index) -> int:
    """User ``submit(lora_index=...)`` -> internal stacked index.

    ``None`` routes to the zeros base adapter (index 0); user adapter ``i``
    maps to stacked index ``i + 1`` (``stack_loras(include_base=True)``)."""
    if lora_index is None:
        return 0
    if not multi:
        raise ValueError(
            "lora_index requires the server to be built with a LIST of "
            "adapters (multi-LoRA); a single adapter applies to all requests"
        )
    idx = int(lora_index)
    if not 0 <= idx < num_adapters:
        raise ValueError(
            f"lora_index {idx} out of range for {num_adapters} adapters"
        )
    return idx + 1


def normalize_buckets(prompt_len) -> tuple:
    """``prompt_len`` int or sequence -> sorted tuple of compiled widths.

    One compiled prefill width wastes compute (and, paged, pages) on short
    prompts; a small set of buckets is the standard XLA answer (VERDICT r2
    #7): requests pad to the smallest bucket >= their width and admission
    batches per bucket, so each width is one compiled program.
    """
    if isinstance(prompt_len, (int, np.integer)):
        buckets = (int(prompt_len),)
    else:
        buckets = tuple(sorted({int(p) for p in prompt_len}))
    if not buckets or buckets[0] <= 0:
        raise ValueError(f"invalid prompt_len buckets {buckets}")
    return buckets


def pick_bucket(buckets, width: int) -> int:
    for b in buckets:
        if width <= b:
            return b
    raise ValueError(
        f"prompt width {width} exceeds the largest compiled bucket "
        f"{buckets[-1]}"
    )


def make_slot_insert(bp: int):
    """Build the donated slot-insert program body for a dense cache pytree.

    ``insert(cache, cache_p, slots)`` writes admission row ``r`` of the
    prefilled ``cache_p`` into slot ``slots[r]`` of the server cache for
    every cache buffer — (L, B, S, ...) k/v (+ scales), (B, S) mask, (B,)
    index. Unrolled static loop; jit with ``donate_argnums=(0,)`` so each
    dynamic_update_slice is an in-place write. Shared by the dense server,
    the speculative server (its draft cache), and the paged speculative
    server's draft cache.
    """

    def insert(cache, cache_p, slots):
        def put_row(buf, new, row, slot):
            if buf.ndim >= 4:  # (L, B, S, ...) k/v
                start = (0, slot) + (0,) * (buf.ndim - 2)
                return jax.lax.dynamic_update_slice(
                    buf, new[:, row : row + 1], start
                )
            if buf.ndim == 2:  # (B, S) mask
                return jax.lax.dynamic_update_slice(
                    buf, new[row : row + 1], (slot, 0)
                )
            return jax.lax.dynamic_update_slice(
                buf, new[row : row + 1], (slot,)
            )  # (B,) index

        for row in range(bp):
            cache = jax.tree_util.tree_map(
                lambda b, n, row=row: put_row(b, n, row, slots[row]),
                cache,
                cache_p,
            )
        return cache

    return insert


def _pad_to(ids: np.ndarray, mask: np.ndarray, bucket: int):
    pad = bucket - ids.shape[1]
    if pad == 0:
        return ids, mask
    return (
        np.pad(ids, ((0, 0), (0, pad))),
        np.pad(mask, ((0, 0), (0, pad))),
    )


class GenerationServer:
    """Admit requests any time; tick decode across all occupied slots."""

    def __init__(
        self,
        model: FastVLM,
        params,
        num_slots: int = 8,
        prompt_len=64,
        max_new_tokens: int = 32,
        eos_token_id: int = 2,
        prefill_batch: int = 4,
        mesh=None,
        temperature: float = 0.0,
        top_p: float = 1.0,
        seed: int = 0,
        lora=None,
        cache_slack: int = 0,
        image_prep=None,
    ) -> None:
        """``mesh``: optional TP mesh — parameters and the KV cache (kv heads
        over ``model``) are placed on it and GSPMD shards every program; use
        ``make_mesh(data=1, model=N)`` (sharding the slot axis over ``data``
        would route every slot insert through cross-chip collectives).

        ``prompt_len``: one compiled prompt width (int) or a set of bucket
        widths (sequence). Requests may be submitted at any width <= the
        largest bucket; they pad to the smallest covering bucket and
        admission batches per bucket (one compiled prefill program each —
        short prompts stop paying the full-width prefill).

        ``lora``: optional adapters (``io/lora.py``) served over the frozen
        (optionally quantized) base — one tree applies to every request;
        a LIST of trees enables multi-LoRA (``submit(lora_index=i)`` routes
        each request through its adapter in the same batched programs;
        ``None`` rows take the zeros base adapter). Adapters are replicated
        on the mesh (rank-r deltas are megabytes; GSPMD re-partitions them
        against the TP-sharded projections).

        ``cache_slack``: extra cache positions past
        ``image + prompt + max_new_tokens`` — used by the speculative
        subclass, whose rounds write a ``k + 1`` window before rolling the
        rejected suffix back (``serving/speculative.py``).

        ``image_prep``: optional pure fn applied to submitted images INSIDE
        the jitted admission program (e.g.
        ``model/fastvlm_adapter.prepare_policy_images`` — letterbox +
        normalize to the tower resolution). Lets callers submit raw
        env-resolution frames so only small arrays cross the host boundary;
        without it, submitted images must already be tower-sized."""
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.sharding import shard_params

            params = shard_params(mesh, params)
        self.params = params
        self._lora, self._lora_multi, self._num_adapters = normalize_lora(lora)
        if self._lora is not None and mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self._lora = jax.device_put(
                self._lora, NamedSharding(mesh, PartitionSpec())
            )
        self.num_slots = num_slots
        self.prompt_buckets = normalize_buckets(prompt_len)
        self.prompt_len = self.prompt_buckets[-1]
        self.max_new_tokens = max_new_tokens
        self.eos_token_id = eos_token_id
        self.prefill_batch = max(1, min(prefill_batch, num_slots))
        self.temperature = float(temperature)
        self.top_p = float(top_p)
        self._base_key = jax.random.PRNGKey(seed)
        self._sample_counter = 0

        cfg = model.cfg
        self._cache_len = (
            cfg.num_image_tokens + self.prompt_len + max_new_tokens
            + int(cache_slack)
        )
        # +1 trash slot: dummy admission rows land there (never decoded).
        self.cache = init_kv_cache(cfg.text, num_slots + 1, self._cache_len)
        if mesh is not None:
            from ..parallel.sharding import shard_cache

            self.cache = shard_cache(mesh, self.cache)
        self._slots = [_Slot() for _ in range(num_slots)]
        self._pending: List[_Pending] = []
        self._next_rid = 0
        self._pending_token = np.full(num_slots + 1, eos_token_id, np.int32)
        self._finished_buffer: Dict[int, List[int]] = {}
        # Server-level modality, fixed by the first submitted request: the
        # compiled prefill program either takes images or it doesn't, so a
        # server can't mix multimodal and text-only requests. Validated at
        # ``submit`` (before any slot/cache state is touched), never mid-admit.
        self._multimodal: Optional[bool] = None

        bp = self.prefill_batch

        from .sampling import sample_tokens

        temp, top_p_ = self.temperature, self.top_p

        def _variables(params, lora):
            return {"params": params} if lora is None else {
                "params": params, "lora": lora
            }

        image_prep_ = image_prep
        self.image_prep = image_prep

        def prefill_batched(params, images, ids, mask, key, lora):
            if images is not None and image_prep_ is not None:
                images = image_prep_(images)
            cache_p = init_kv_cache(cfg.text, bp, self._cache_len)
            last_logits, _, cache_p, _, _ = model.apply(
                _variables(params, lora), images, ids, mask, cache_p,
                method=FastVLM.prefill,
            )
            return sample_tokens(last_logits, key, temp, top_p_), cache_p

        # slots: (bp,) int32 slot index per admitted row (trash slot for
        # dummies); see make_slot_insert.
        insert = make_slot_insert(bp)

        def decode(params, tokens, cache, key, lora):
            logits, cache = model.apply(
                _variables(params, lora), tokens[:, None], cache,
                method=FastVLM.decode_step,
            )
            return sample_tokens(logits, key, temp, top_p_), cache

        self._prefill = jax.jit(prefill_batched)
        self._insert = jax.jit(insert, donate_argnums=(0,))
        self._decode = jax.jit(decode, donate_argnums=(2,))

        # N decode ticks as ONE compiled scan with ONE host fetch (step_n):
        # on the tunneled backend each step() pays a ~30 ms dispatch+fetch
        # round trip, so fixed-length decode loads (the action-token policy:
        # every request emits exactly action_dim tokens, eos never fires)
        # run the whole tail in one program. Lazily compiled per n.
        decode_n_progs: Dict[int, object] = {}

        def get_decode_n(n: int):
            if n not in decode_n_progs:

                def decode_n(params, tokens, cache, key, lora):
                    keys = jax.random.split(key, n)

                    def body(carry, k_):
                        tok, c = carry
                        logits, c = model.apply(
                            _variables(params, lora), tok[:, None], c,
                            method=FastVLM.decode_step,
                        )
                        nxt = sample_tokens(logits, k_, temp, top_p_)
                        return (nxt, c), nxt

                    (_, cache), toks = jax.lax.scan(
                        body, (tokens, cache), keys
                    )
                    return toks.T, cache  # (B, n)

                decode_n_progs[n] = jax.jit(decode_n, donate_argnums=(2,))
            return decode_n_progs[n]

        self._get_decode_n = get_decode_n

    def _lora_arg(self, ids: Optional[np.ndarray]):
        return lora_call_arg(self._lora, self._lora_multi, ids)

    # ------------------------------------------------------------------

    def _next_key(self):
        """Fresh PRNG key per sampling program (deterministic stream)."""
        self._sample_counter += 1
        return jax.random.fold_in(self._base_key, self._sample_counter)

    def has_free_slot(self) -> bool:
        return self._free_slot_count() > 0

    def _free_slot_count(self) -> int:
        return sum(not s.active for s in self._slots) - len(self._pending)

    @property
    def num_active(self) -> int:
        return sum(s.active for s in self._slots) + len(self._pending)

    def submit(
        self,
        input_ids: np.ndarray,  # (T,) or (1, T), T <= the largest bucket
        attention_mask: np.ndarray,
        images: Optional[np.ndarray] = None,  # (1, 3, S, S) when multimodal
        lora_index: Optional[int] = None,
    ) -> int:
        """Queue a request for admission; returns a request id. The request
        pads to the smallest covering prompt bucket; the prefill itself runs
        batched per bucket at the next ``step``/``flush``. ``lora_index``
        picks the request's adapter on a multi-LoRA server (None = base)."""
        if self._free_slot_count() <= 0:
            raise RuntimeError("no free generation slots")
        lidx = resolve_lora_index(
            self._lora_multi, self._num_adapters, lora_index
        )
        self._check_modality(images is not None)
        ids = np.atleast_2d(np.asarray(input_ids, np.int32))
        mask = np.atleast_2d(np.asarray(attention_mask, np.int32))
        bucket = pick_bucket(self.prompt_buckets, ids.shape[1])
        ids, mask = _pad_to(ids, mask, bucket)
        rid = self._next_rid
        self._next_rid += 1
        self._pending.append(_Pending(rid, ids, mask, images, bucket, lidx))
        return rid

    def _check_modality(self, is_multimodal: bool) -> None:
        """Reject a modality mismatch up front, before any state mutates."""
        if self._multimodal is None:
            self._multimodal = is_multimodal
        elif is_multimodal != self._multimodal:
            raise ValueError(
                "all requests in a server must be consistently "
                "multimodal or text-only"
            )

    def flush(self) -> None:
        """Admit queued requests, ``prefill_batch`` per compiled call.

        With prompt buckets, admission groups by bucket (FIFO by the oldest
        pending request's bucket) so every prefill call is one compiled
        width."""
        while self._pending:
            bucket = self._pending[0].bucket
            batch = [p for p in self._pending if p.bucket == bucket][
                : self.prefill_batch
            ]
            taken = {id(p) for p in batch}
            self._pending = [p for p in self._pending if id(p) not in taken]
            self._admit(batch)

    def _assemble_admission(self, batch: List[_Pending]):
        """Pack an admission batch into padded device arrays.

        Returns ``(ids, mask, images, slots, row_lora)`` — ``slots`` maps
        each row to its claimed slot (dummy rows to the trash slot)."""
        bp = self.prefill_batch
        n = len(batch)
        width = batch[0].bucket
        ids = np.zeros((bp, width), np.int32)
        mask = np.zeros((bp, width), np.int32)
        # dummy rows keep one real token so last-position indexing is in
        # bounds; their cache rows go to the trash slot.
        ids[n:, 0] = self.eos_token_id
        mask[n:, 0] = 1
        images = None
        if batch[0].images is not None:
            img0 = np.asarray(batch[0].images)
            images = np.zeros((bp,) + img0.shape[1:], img0.dtype)
        slots = np.full(bp, self.num_slots, np.int32)  # default: trash slot
        row_lora = np.zeros(bp, np.int32)  # dummy rows: base adapter
        free = [i for i, s in enumerate(self._slots) if not s.active]
        for row, req in enumerate(batch):
            ids[row] = req.input_ids[0]
            mask[row] = req.attention_mask[0]
            # modality consistency was enforced at submit() time
            if images is not None:
                images[row] = req.images[0]
            slots[row] = free[row]
            row_lora[row] = req.lora_index
        return ids, mask, images, slots, row_lora

    def _register_admitted(
        self, batch: List[_Pending], slots: np.ndarray, first_host: np.ndarray
    ) -> None:
        """Slot bookkeeping after the prefill program(s) ran."""
        for row, req in enumerate(batch):
            slot_idx = int(slots[row])
            slot = self._slots[slot_idx]
            slot.request_id = req.request_id
            slot.active = True
            slot.tokens = [int(first_host[row])]
            slot.remaining = self.max_new_tokens - 1
            slot.lora_index = req.lora_index
            self._pending_token[slot_idx] = int(first_host[row])
            self._finish_if_done(slot_idx)

    def _admit(self, batch: List[_Pending]) -> None:
        ids, mask, images, slots, row_lora = self._assemble_admission(batch)
        first_tokens, cache_p = self._prefill(
            self.params,
            jnp.asarray(images) if images is not None else None,
            jnp.asarray(ids),
            jnp.asarray(mask),
            self._next_key(),
            self._lora_arg(row_lora),
        )
        self.cache = self._insert(self.cache, cache_p, jnp.asarray(slots))
        self._register_admitted(batch, slots, np.asarray(first_tokens))

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
        """Admit pending requests, then one decode tick across all slots;
        returns finished request outputs (including any that completed at
        admission time)."""
        self.flush()
        if any(s.active for s in self._slots):
            tokens = jnp.asarray(self._pending_token)
            slot_lora = np.zeros(self.num_slots + 1, np.int32)
            for i, s in enumerate(self._slots):
                if s.active:
                    slot_lora[i] = s.lora_index
            next_tokens, self.cache = self._decode(
                self.params, tokens, self.cache, self._next_key(),
                self._lora_arg(slot_lora),
            )
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

    def step_n(self, n: int) -> Dict[int, List[int]]:
        """Admit pending requests, then run up to ``n`` decode ticks as ONE
        compiled scan with ONE host fetch.

        The host-side semantics match ``n`` consecutive ``step()`` calls for
        fixed-length loads: the effective tick count is
        ``min(n, min(remaining over active slots))`` so no slot overruns its
        token budget, and greedy outputs are token-identical to single
        ticks (pinned in ``tests/test_serving.py``). Requires
        ``eos_token_id < 0`` when more than one tick would run (a scanned
        program cannot stop at EOS mid-scan); sampled runs use one key split
        across the scan — the stream differs from single ticks but the
        distribution is identical. This is the action-token serving tick
        (``serving/token_policy_server.py``): every control-tick request
        emits exactly ``action_dim`` tokens, so the whole decode tail is one
        dispatch instead of ``action_dim`` RTT-bound programs.
        """
        self.flush()
        active = [i for i, s in enumerate(self._slots) if s.active]
        if active:
            n_eff = min(int(n), min(self._slots[i].remaining for i in active))
            if n_eff <= 1:
                return self.step()
            if self.eos_token_id >= 0:
                raise ValueError(
                    "step_n with n > 1 requires eos_token_id < 0 (the "
                    "scanned decode cannot stop at EOS mid-program)"
                )
            slot_lora = np.zeros(self.num_slots + 1, np.int32)
            for i in active:
                slot_lora[i] = self._slots[i].lora_index
            toks, self.cache = self._get_decode_n(n_eff)(
                self.params,
                jnp.asarray(self._pending_token),
                self.cache,
                self._next_key(),
                self._lora_arg(slot_lora),
            )
            toks_host = np.asarray(toks)  # (B, n_eff): ONE fetch
            for i in active:
                slot = self._slots[i]
                slot.tokens.extend(int(t) for t in toks_host[i])
                slot.remaining -= n_eff
                self._pending_token[i] = int(toks_host[i, -1])
                self._finish_if_done(i)
        finished = self._finished_buffer
        self._finished_buffer = {}
        return finished

    def run_to_completion(self, max_ticks: Optional[int] = None) -> Dict[int, List[int]]:
        """Drain all active slots; convenience for tests/offline use.

        ``max_ticks`` bounds decode ticks exactly (a tick past the cap was a
        round-2 review finding); ``step`` itself flushes pending admissions,
        so no trailing call is needed when the queue drains naturally."""
        outputs: Dict[int, List[int]] = {}
        ticks = 0
        while self.num_active and (max_ticks is None or ticks < max_ticks):
            outputs.update(self.step())
            ticks += 1
        return outputs
