"""FastVLM (llava_qwen2) composition: FastViTHD + mm projector + Qwen2.

The reference loads this composite opaquely from Apple's HF checkpoint with
``trust_remote_code=True`` (reference ``fastvlm_adapter.py:185-191``) and calls
it at ``fastvlm_adapter.py:533`` with ``output_hidden_states=True``. Here the
composite is an explicit Flax module so the whole pixels+text -> hidden-states
path is one jittable XLA program.

Image-token splice semantics
----------------------------
LLaVA-style models splice projected image tokens into the text embedding
sequence at ``<image>`` placeholder positions. The reference tokenizes raw
task strings (``fastvlm_adapter.py:361-380``) which contain no placeholder, so
under Apple's remote code the image features are *dropped* and the backbone
features are effectively text-only — a real behavioral quirk of the reference
(see SURVEY.md §3.1 on the text-mask pooling subtlety). We support both:

- ``image_token_mode="prefix"`` (default): projected image tokens are
  prepended to the text sequence — the splice that a placeholder right after
  BOS would produce, and the behavior a VLA actually needs.
- ``image_token_mode="none"``: strict reference parity — text-only features,
  the vision tower is not even executed.

Both paths are static-shape: image token count is a function of image size
only, so XLA sees one fixed sequence length.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from .fastvit import FastViTHD, FastViTHDConfig, fastvithd, fastvithd_tiny
from .qwen2 import Qwen2Config, Qwen2Model, qwen2_0_5b, qwen2_1_5b, qwen2_7b, qwen2_tiny


@dataclasses.dataclass(frozen=True)
class FastVLMConfig:
    """Composite config: vision tower + text decoder + projector + splice."""

    vision: FastViTHDConfig = dataclasses.field(default_factory=fastvithd)
    text: Qwen2Config = dataclasses.field(default_factory=qwen2_0_5b)
    # Square input side fed to the vision tower. All FastVLM stage-3
    # checkpoints declare 1024 via the tower name ("mobileclip_l_1024",
    # reference ``fastvlm_adapter.py:300-335``).
    image_size: int = 1024
    image_token_mode: str = "prefix"  # "prefix" | "none"
    # Cameras per observation. >1 encodes each view through the (shared)
    # tower and concatenates the visual tokens (multi-camera ALOHA setups;
    # the reference consumes only the first camera,
    # ``lerobot_fastvla/modeling_fastvla.py:82``).
    num_cameras: int = 1

    @property
    def num_image_tokens(self) -> int:
        if self.image_token_mode == "none":
            return 0
        side = self.image_size // self.vision.downsample_factor
        return self.num_cameras * side * side

    @property
    def hidden_size(self) -> int:
        return self.text.hidden_size

    def replace(self, **kw) -> "FastVLMConfig":
        return dataclasses.replace(self, **kw)


def fastvlm_0_5b(**kw) -> FastVLMConfig:
    return FastVLMConfig(vision=fastvithd(), text=qwen2_0_5b(), **kw)


def fastvlm_1_5b(**kw) -> FastVLMConfig:
    return FastVLMConfig(vision=fastvithd(), text=qwen2_1_5b(), **kw)


def fastvlm_7b(**kw) -> FastVLMConfig:
    return FastVLMConfig(vision=fastvithd(), text=qwen2_7b(), **kw)


def fastvlm_tiny(**kw) -> FastVLMConfig:
    """Tiny composite for tests: 2-layer decoder, 48->96-wide tower, 64px."""
    kw.setdefault("image_size", 64)
    return FastVLMConfig(vision=fastvithd_tiny(), text=qwen2_tiny(), **kw)


class MMProjector(nn.Module):
    """LLaVA mlp2x_gelu projector: vision width -> decoder hidden size."""

    hidden_size: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x)
        x = nn.gelu(x)
        x = nn.Dense(self.hidden_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc2")(x)
        return x


class FastVLM(nn.Module):
    """Pixels + tokenized instruction -> decoder hidden states.

    ``__call__`` returns ``(hidden, seq_mask, text_mask)`` where ``hidden`` is
    the post-final-norm hidden sequence (HF ``hidden_states[-1]``, what the
    reference pools at ``fastvlm_adapter.py:551-560``), ``seq_mask`` marks
    real positions of the full multimodal sequence, and ``text_mask`` marks
    text positions within it (for reference-parity pooling).

    ``prefill``/``decode_step`` expose the KV-cached generation path (the
    reference has no generation API — its backbone only pools features — but
    the underlying checkpoint is a full VLM; serving uses these for
    autoregressive decoding, ``vla_fastvlm_tpu/serving``).
    """

    cfg: FastVLMConfig

    def setup(self):
        cfg = self.cfg
        self.language_model = Qwen2Model(cfg.text)
        if cfg.num_image_tokens > 0:
            self.vision_tower = FastViTHD(cfg.vision)
            self.mm_projector = MMProjector(
                cfg.text.hidden_size, cfg.text.dtype, cfg.text.param_dtype
            )
        if not cfg.text.tie_word_embeddings:
            self.lm_head = nn.Dense(
                cfg.text.vocab_size,
                use_bias=False,
                dtype=cfg.text.dtype,
                param_dtype=cfg.text.param_dtype,
            )

    def encode_images(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, 3, S, S) or (B, ncam, 3, S, S) -> (B, N_img, H) visual tokens.

        Multi-camera batches fold views into the batch dim for one shared
        tower pass (one big MXU-friendly conv batch), then concatenate the
        per-view token sequences.
        """
        if images.ndim == 5:
            b, ncam = images.shape[:2]
            folded = images.reshape((b * ncam,) + images.shape[2:])
            tokens = self.vision_tower(folded)
            tokens = tokens.reshape(b, ncam * tokens.shape[1], tokens.shape[2])
        else:
            tokens = self.vision_tower(images)
        return self.mm_projector(tokens)

    def _splice(self, images, input_ids, attention_mask):
        cfg = self.cfg
        b, t = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, t), jnp.int32)
        attention_mask = attention_mask.astype(jnp.int32)

        # Embedding goes through the decoder's own table so the parameter
        # tree matches the HF checkpoint layout (model.embed_tokens).
        text_embeds = self.language_model.embed(input_ids)

        n_img = cfg.num_image_tokens
        if n_img > 0:
            assert images is not None, "image_token_mode=prefix requires images"
            image_embeds = self.encode_images(images)
            inputs_embeds = jnp.concatenate(
                [image_embeds.astype(text_embeds.dtype), text_embeds], axis=1
            )
            img_mask = jnp.ones((b, n_img), jnp.int32)
            seq_mask = jnp.concatenate([img_mask, attention_mask], axis=1)
            text_mask = jnp.concatenate(
                [jnp.zeros((b, n_img), jnp.int32), attention_mask], axis=1
            )
        else:
            inputs_embeds = text_embeds
            seq_mask = attention_mask
            text_mask = attention_mask
        return inputs_embeds, seq_mask, text_mask

    def __call__(
        self,
        images: Optional[jnp.ndarray],  # (B, 3, S, S) or (B, S, S, 3); None ok
        input_ids: jnp.ndarray,  # (B, T)
        attention_mask: Optional[jnp.ndarray] = None,  # (B, T), 1 = real
        deterministic: bool = True,
    ):
        inputs_embeds, seq_mask, text_mask = self._splice(
            images, input_ids, attention_mask
        )
        hidden, _, _ = self.language_model(
            inputs_embeds=inputs_embeds,
            attention_mask=seq_mask,
            causal=True,
        )
        return hidden, seq_mask, text_mask

    def forward_logits(
        self,
        images: Optional[jnp.ndarray],
        input_ids: jnp.ndarray,  # (B, T)
        attention_mask: Optional[jnp.ndarray] = None,
    ):
        """Full-sequence lm_head logits for token-level losses.

        Returns ``(logits (B, N_img + T, V), seq_mask, text_mask)``. Used by
        the autoregressive action-token policy
        (``fastvla/token_policy.py``) for teacher-forced cross-entropy; the
        reference has no generation/logit surface at all (its backbone only
        pools hidden states, reference ``fastvlm_adapter.py:551-560``).
        """
        inputs_embeds, seq_mask, text_mask = self._splice(
            images, input_ids, attention_mask
        )
        hidden, _, tied = self.language_model(
            inputs_embeds=inputs_embeds,
            attention_mask=seq_mask,
            causal=True,
            compute_tied_logits=self.cfg.text.tie_word_embeddings,
        )
        return self._logits(hidden, tied), seq_mask, text_mask

    def _logits(self, hidden: jnp.ndarray, tied_logits) -> jnp.ndarray:
        if self.cfg.text.tie_word_embeddings:
            return tied_logits
        if self.cfg.text.quantization != "none" and not self.is_initializing():
            # Quantized untied head (io/quantize.py puts "lm_head" in
            # DEFAULT_QUANT_NAMES): nn.Dense would silently matmul the raw
            # int8 codes and drop the scale — apply via the quant helper.
            from ..ops.quant import dense_apply

            return dense_apply(
                hidden, self.variables["params"]["lm_head"], self.cfg.text.dtype,
                act_quant=self.cfg.text.quantization == "w8a8",
            )
        return self.lm_head(hidden)

    def prefill(
        self,
        images: Optional[jnp.ndarray],
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray],
        cache: dict,
    ):
        """Multimodal prefill into a KV cache.

        Returns ``(last_logits, hidden, new_cache, seq_mask, text_mask)``
        where ``last_logits`` is (B, V) at each sequence's true last position.
        """
        inputs_embeds, seq_mask, text_mask = self._splice(
            images, input_ids, attention_mask
        )
        hidden, new_cache, tied = self.language_model(
            inputs_embeds=inputs_embeds,
            attention_mask=seq_mask,
            cache=cache,
            causal=True,
            compute_tied_logits=self.cfg.text.tie_word_embeddings,
        )
        logits = self._logits(hidden, tied)
        lengths = seq_mask.sum(axis=1)
        idx = jnp.clip(lengths - 1, 0, None)
        last_logits = jnp.take_along_axis(
            logits, idx[:, None, None], axis=1
        )[:, 0, :]
        # Cache slot accounting: the language model advances the shared
        # per-batch cursor ``cache["index"]`` by the PADDED prefill width t
        # (qwen2.py Qwen2Model.__call__, ``index + t``) — decode tokens for
        # every example land at slot t, t+1, ..., not at each example's true
        # length. Pad-position slots are dead but harmless: the stored kv
        # mask marks them invalid so attention never reads them, and RoPE
        # positions are computed from the true per-example lengths. This
        # wastes (t - len_i) slots per example; exactness under ragged
        # prefill+decode is pinned by tests/test_serving.py.
        return last_logits, hidden, new_cache, seq_mask, text_mask

    def decode_step_paged(self, input_ids: jnp.ndarray, cache: dict):
        """One decode step against a paged KV pool (read-only).

        ``cache`` carries the page pool itself: ``{"pool_k","pool_v"}``
        (L, P, K, page, D), ``"tables"`` (B, P_slot), ``"mask"`` (B, S_max)
        stored validity, ``"index"`` (B,) write cursors; int8 pools add
        ``{"pool_k_scale","pool_v_scale"}`` (L, P, K, page). Attention reads
        pages via the table inside the Pallas kernel (``ops/pallas/
        paged_attention.py``) — no transient gathered window; the decoder
        never writes the pool. Returns ``(logits, rows)`` with ``rows``
        = {"k_rows","v_rows"}: (L, B, K, D) for the server to scatter
        (+ {"k_scale_rows","v_scale_rows"}: (L, B, K) under int8).
        """
        hidden, rows, tied = self.language_model(
            input_ids=input_ids,
            attention_mask=jnp.ones_like(input_ids, dtype=jnp.int32),
            cache=cache,
            causal=True,
            compute_tied_logits=self.cfg.text.tie_word_embeddings,
        )
        logits = self._logits(hidden, tied)
        return logits[:, -1, :], rows

    def decode_step(self, input_ids: jnp.ndarray, cache: dict):
        """One KV-cached decode step: (B, 1) token ids -> (B, V) logits."""
        hidden, new_cache, tied = self.language_model(
            input_ids=input_ids,
            attention_mask=jnp.ones_like(input_ids, dtype=jnp.int32),
            cache=cache,
            causal=True,
            compute_tied_logits=self.cfg.text.tie_word_embeddings,
        )
        logits = self._logits(hidden, tied)
        return logits[:, -1, :], new_cache

    def prefill_image_chunk(self, images: jnp.ndarray, cache: dict) -> dict:
        """Chunked prefill, stage 0: write the image rows into the cache.

        Vision encode + projector run as their own cached step — the
        ``num_image_tokens`` projected embeddings land at cache slots
        ``[0, N_img)`` (the cursor starts at 0) with RoPE positions
        ``0..N_img-1``, exactly where ``prefill``'s front-splice puts them
        (``_splice``). Chunked prefill lets a serving tick bound its
        admission work to one chunk instead of the whole prompt
        (``serving/paged_kv.py``, ``prefill_chunk_tokens``); no reference
        counterpart (the reference has no serving path,
        ``lerobot_fastvla/modeling_fastvla.py:113-125`` is one eager
        forward per env step).
        """
        image_embeds = self.encode_images(images)
        b, n_img, _ = image_embeds.shape
        _, new_cache, _ = self.language_model(
            inputs_embeds=image_embeds,
            attention_mask=jnp.ones((b, n_img), jnp.int32),
            cache=cache,
            causal=True,
        )
        return new_cache

    def prefill_text_chunk(
        self,
        input_ids: jnp.ndarray,  # (B, C)
        attention_mask: jnp.ndarray,  # (B, C) 1 = real token
        cache: dict,
    ):
        """Chunked prefill, stage 1+: one (B, C) prompt chunk vs the cache.

        Returns ``((B, C, V) logits, new_cache)``. The cached-decode branch
        of ``Qwen2Model`` gives exact prefill semantics per chunk: new K/V
        rows land at slots ``[index, index+C)``, causality runs on slot
        indices (position i sees cache + chunk positions <= i), RoPE
        positions continue each row's TRUE valid count (pads advance the
        cursor but stay masked — identical to the unchunked padded
        prefill's dead-slot accounting, see ``prefill``). Exactness vs the
        one-shot prefill is pinned in ``tests/test_chunked_prefill.py``.
        """
        hidden, new_cache, tied = self.language_model(
            input_ids=input_ids,
            attention_mask=attention_mask,
            cache=cache,
            causal=True,
            compute_tied_logits=self.cfg.text.tie_word_embeddings,
        )
        return self._logits(hidden, tied), new_cache

    def verify_step_paged(self, input_ids: jnp.ndarray, cache: dict):
        """Speculative verify window against a paged KV pool (read-only).

        The paged counterpart of ``verify_step`` (``serving/
        speculative_paged.py``): (B, W) draft-window ids + the page-pool
        cache dict of ``decode_step_paged`` -> ((B, W, V) logits, rows).
        Window position ``i`` sits at slot ``index + i`` and attends the
        stored pages plus window positions ``<= i`` (slot-causal —
        ``ops/attention.paged_attention`` with W queries), so the target's
        continuation of each accepted prefix is read from one forward.
        ``rows`` carries the window's K/V (``k_rows``/``v_rows``:
        (L, B, W, K, D), + (L, B, W, K) scales under int8) for the server
        to scatter; the host rolls back the rejected suffix by advancing
        its slot masks/lengths only ``accepted + 1`` positions. No
        reference counterpart (the reference never generates text).
        """
        hidden, rows, tied = self.language_model(
            input_ids=input_ids,
            attention_mask=jnp.ones_like(input_ids, dtype=jnp.int32),
            cache=cache,
            causal=True,
            compute_tied_logits=self.cfg.text.tie_word_embeddings,
        )
        return self._logits(hidden, tied), rows

    def verify_step(self, input_ids: jnp.ndarray, cache: dict):
        """Multi-token cached decode returning EVERY position's logits.

        The speculative-decoding verify pass (``serving/speculative.py``):
        (B, W) draft-window ids -> ((B, W, V) logits, cache). Position i's
        logits depend only on the cache plus window tokens <= i (the cached
        decode branch builds a slot-causal bias — ``models/qwen2.py``), so
        the target's greedy continuation of each accepted prefix is read
        from one forward. The cache advances by W; the caller rolls back
        the rejected suffix (``speculative.py::_rollback``). No reference
        counterpart (the reference never generates text).
        """
        hidden, new_cache, tied = self.language_model(
            input_ids=input_ids,
            attention_mask=jnp.ones_like(input_ids, dtype=jnp.int32),
            cache=cache,
            causal=True,
            compute_tied_logits=self.cfg.text.tie_word_embeddings,
        )
        return self._logits(hidden, tied), new_cache


def pool_hidden(
    hidden: jnp.ndarray,  # (B, T, H)
    mask: Optional[jnp.ndarray],  # (B, T) or None
    mode: str,
) -> jnp.ndarray:
    """Masked pooling over the sequence axis: (B, T, H) -> (B, H).

    Parity with reference ``_pool_hidden`` (``fastvlm_adapter.py:337-359``):
    ``mean_pool`` is a mask-weighted mean with denominator clamped at 1e-6;
    ``last_token`` gathers at index ``sum(mask) - 1`` (clamped at 0), or the
    final position when no mask is given.
    """
    if mode == "mean_pool":
        if mask is None:
            return hidden.mean(axis=1)
        m = mask.astype(hidden.dtype)[..., None]
        summed = (hidden * m).sum(axis=1)
        denom = jnp.clip(m.sum(axis=1), 1e-6, None)
        return summed / denom

    if mode != "last_token":
        raise ValueError(f"unknown pooling mode {mode!r}")
    if mask is None:
        return hidden[:, -1, :]
    lengths = mask.astype(jnp.int32).sum(axis=1)
    idx = jnp.clip(lengths - 1, 0, None)  # (B,)
    return jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0, :]


def pool_last_text_token(
    hidden: jnp.ndarray,  # (B, T, H) multimodal hidden sequence
    text_mask: jnp.ndarray,  # (B, T) 1 at text positions
) -> jnp.ndarray:
    """Pool at the last *text* token of the multimodal sequence.

    This is the corrected version of the reference's pooling quirk: the
    reference computes the last-token index from text lengths alone
    (``fastvlm_adapter.py:558-559``), which is wrong whenever image tokens are
    spliced in front. Here we find the true last text position via the text
    mask (argmax of position*mask), independent of how many image tokens
    precede it.
    """
    positions = jnp.arange(hidden.shape[1], dtype=jnp.int32)[None, :]
    last = jnp.argmax(jnp.where(text_mask > 0, positions, -1), axis=1)  # (B,)
    return jnp.take_along_axis(hidden, last[:, None, None], axis=1)[:, 0, :]
