"""Qwen2 decoder in Flax (linen), TPU-first.

The reference consumes Qwen2 opaquely inside the HF ``llava_qwen2`` checkpoint
remote code (``fastvlm_adapter.py:185-191``, SURVEY.md L0); here it is
first-class, with:

- parameter names mirroring the HF checkpoint layout so the safetensors
  converter (``vla_fastvlm_tpu/io/weights.py``) is a pure transpose/stack map,
- GQA attention with RoPE and an explicit functional KV cache,
- ``nn.scan`` over layers (stacked params -> one compiled layer body; fast XLA
  compiles and a natural (num_layers, ...) leading axis for sharding),
- fp32 softmax / RMSNorm internals for bit-comparable features at fp32 and
  stable bf16 training,
- a hook for the Pallas flash-attention kernel on the jitted TPU hot path.

Numerics are validated against ``transformers.Qwen2ForCausalLM`` in
``tests/test_qwen2_parity.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import attention, make_attention_bias
from ..ops.norms import rms_norm
from ..ops.quant import dense_apply, fused_dense_apply
from ..ops.rope import apply_rope, rope_cos_sin


@dataclasses.dataclass(frozen=True)
class Qwen2Config:
    vocab_size: int = 151936
    hidden_size: int = 896
    num_hidden_layers: int = 24
    num_attention_heads: int = 14
    num_key_value_heads: int = 2
    intermediate_size: int = 4864
    head_dim: Optional[int] = None
    rope_theta: float = 1_000_000.0
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = True
    max_position_embeddings: int = 32768
    # runtime knobs (not part of the checkpoint contract)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    scan_layers: bool = True
    remat: bool = False
    attention_impl: str = "auto"  # "auto" | "xla" | "flash"
    # Concatenate q/k/v and gate/up projection kernels at APPLY time and run
    # one matmul each (measured on v5e: 5.8x / 3.3x faster than the three/two
    # separate small-N dots at prefill shapes — see ROADMAP). The parameter
    # tree is unchanged (kernels are concatenated inside the jitted fn), so
    # checkpoints and the HF weight converter are unaffected.
    fused_projections: bool = True
    # Quantized serving mode ("none" | "int8" | "int4" | "w8a8"): matmul
    # kernels are stored int8 (per-output-channel scales) or int4
    # (per-group-of-128 scales) — 2x / 4x less HBM weight traffic than bf16,
    # the bound on small-batch decode (``ops/quant.py``). "w8a8" stores int8
    # and additionally quantizes activations per token at apply time so the
    # dots run on the MXU's 2x-throughput int8 path — the compute-bound
    # prefill lever. Apply with a tree produced by
    # ``io/quantize.quantize_params``; training and init always use float
    # params. No reference equivalent (the reference serves eager torch
    # fp32/bf16) — TPU-native extension, flag-gated.
    quantization: str = "none"
    # KV cache storage ("none" | "int8"): int8 halves persistent cache HBM
    # (per-position-per-head scales; quantize at write, dequantize at read).
    # Orthogonal to weight quantization; serving-only like it.
    kv_cache_quantization: str = "none"

    @property
    def resolved_head_dim(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    def replace(self, **kw) -> "Qwen2Config":
        return dataclasses.replace(self, **kw)


# ---- presets matching Apple FastVLM's Qwen2 text towers -------------------

def qwen2_0_5b(**kw) -> Qwen2Config:
    return Qwen2Config(**kw)


def qwen2_1_5b(**kw) -> Qwen2Config:
    return Qwen2Config(
        hidden_size=1536, num_hidden_layers=28, num_attention_heads=12,
        num_key_value_heads=2, intermediate_size=8960, **kw,
    )


def qwen2_7b(**kw) -> Qwen2Config:
    return Qwen2Config(
        vocab_size=152064, hidden_size=3584, num_hidden_layers=28,
        num_attention_heads=28, num_key_value_heads=4, intermediate_size=18944,
        tie_word_embeddings=False, **kw,
    )


def qwen2_tiny(**kw) -> Qwen2Config:
    """Small config for tests/fixtures (SURVEY.md §4: tiny fake backbone)."""
    return Qwen2Config(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        **kw,
    )


# ---- KV cache -------------------------------------------------------------

def init_kv_cache(
    cfg: Qwen2Config, batch_size: int, max_len: int, dtype: Any | None = None
) -> dict:
    """Functional KV cache: stacked per-layer key/value buffers.

    Layout (L, B, S, K, D) so the scanned decoder consumes axis 0 directly.

    With ``cfg.kv_cache_quantization == "int8"`` the K/V buffers are stored
    int8 with per-(position, kv-head) symmetric scales ``k_scale``/``v_scale``
    (L, B, S, K) — halving persistent cache HBM (2x the slots or context at
    the same budget). Values are quantized at write and dequantized at read
    inside the attention (``ops/quant.quantize_kv``/``dequantize_kv``);
    accuracy bounds are pinned in ``tests/test_kv_cache_quant.py``.
    """
    dtype = dtype or cfg.dtype
    shape = (
        cfg.num_hidden_layers,
        batch_size,
        max_len,
        cfg.num_key_value_heads,
        cfg.resolved_head_dim,
    )
    cache = {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "mask": jnp.zeros((batch_size, max_len), jnp.bool_),
        # Per-example write cursor: slot where the next tokens land. Scalar
        # for classic batch decode would suffice, but per-example cursors are
        # what continuous batching needs (slots prefill/finish independently).
        "index": jnp.zeros((batch_size,), jnp.int32),
    }
    if cfg.kv_cache_quantization == "int8":
        cache["k"] = cache["k"].astype(jnp.int8)
        cache["v"] = cache["v"].astype(jnp.int8)
        cache["k_scale"] = jnp.zeros(shape[:-1], jnp.float32)
        cache["v_scale"] = jnp.zeros(shape[:-1], jnp.float32)
    elif cfg.kv_cache_quantization != "none":
        raise ValueError(
            f"unknown kv_cache_quantization {cfg.kv_cache_quantization!r}"
        )
    return cache


def _lora_delta(module: nn.Module, y: jnp.ndarray, x: jnp.ndarray, name: str):
    """Add projection ``name``'s low-rank adapter delta, if one is mounted.

    Adapters live in a separate Flax collection — pass ``{"params": ...,
    "lora": lora_tree}`` to ``apply`` (build the tree with
    ``io/lora.init_lora``; sites mirror the param paths). The delta is
    ``x @ A @ B`` with no runtime scalar: the standard ``alpha/rank``
    forward scale is pre-folded into A's init std (``io/lora.py``). The
    base projection output ``y`` and input ``x`` stay untouched when no
    adapter is mounted, so inference/serving paths compile identically
    with LoRA off. No reference counterpart: the reference fine-tunes the
    head only with a hard-frozen backbone (reference
    ``fastvlm_adapter.py:501`` ``@torch.no_grad``); LoRA is what makes
    7B-backbone fine-tuning fit a single chip here.
    """
    site = module.variables.get("lora", {}).get(name)
    if site is None:
        return y
    dt = y.dtype
    if "ids" in site:
        # Multi-LoRA (io/lora.stack_loras + lora_with_ids): a/b carry a
        # leading adapter axis and ``ids`` names each batch row's adapter
        # (0 = the zeros base adapter). Gather rows first — the gathered
        # (B, fan, r) copies are transient and rank-small; the stacked
        # tree itself is never upcast.
        ids = site["ids"]
        a = jnp.take(site["a"], ids, axis=0).astype(dt)  # (B, fan_in, r)
        b_sel = jnp.take(site["b"], ids, axis=0).astype(dt)  # (B, r, out)
        h = jnp.einsum("b...i,bir->b...r", x.astype(dt), a)
        return y + jnp.einsum("b...r,bro->b...o", h, b_sel)
    return y + (x.astype(dt) @ site["a"].astype(dt)) @ site["b"].astype(dt)


class Qwen2Attention(nn.Module):
    cfg: Qwen2Config
    causal: bool = True  # module attribute: stays static under remat/scan

    @nn.compact
    def __call__(self, x, bias, kv_mask, cos, sin, cache_k, cache_v,
                 cache_k_scale, cache_v_scale, cache_index, page_tables=None):
        cfg = self.cfg
        b, t, _ = x.shape
        n, k_heads, d = (
            cfg.num_attention_heads,
            cfg.num_key_value_heads,
            cfg.resolved_head_dim,
        )

        def dense(feats, use_bias, name):
            return nn.Dense(
                feats, use_bias=use_bias, dtype=cfg.dtype,
                param_dtype=cfg.param_dtype, name=name,
            )

        quantized = cfg.quantization != "none" and not self.is_initializing()
        aq = cfg.quantization == "w8a8"
        if self.is_initializing() or not (cfg.fused_projections or quantized):
            q = dense(n * d, True, "q_proj")(x)
            k = dense(k_heads * d, True, "k_proj")(x)
            v = dense(k_heads * d, True, "v_proj")(x)
        elif cfg.fused_projections:
            # One (H, (n+2k)*d) matmul instead of three small-N dots: the
            # separate k/v projections (N=256 at 0.5B) underutilize the MXU.
            # Quantized kernels concatenate in int8 (ops/quant.py).
            p = self.variables["params"]
            qkv = fused_dense_apply(
                x, [p["q_proj"], p["k_proj"], p["v_proj"]], cfg.dtype,
                act_quant=aq,
            )
            q, k, v = jnp.split(qkv, [n * d, (n + k_heads) * d], axis=-1)
        else:
            p = self.variables["params"]
            q = dense_apply(x, p["q_proj"], cfg.dtype, act_quant=aq)
            k = dense_apply(x, p["k_proj"], cfg.dtype, act_quant=aq)
            v = dense_apply(x, p["v_proj"], cfg.dtype, act_quant=aq)
        q = _lora_delta(self, q, x, "q_proj")
        k = _lora_delta(self, k, x, "k_proj")
        v = _lora_delta(self, v, x, "v_proj")
        q = q.reshape(b, t, n, d)
        k = k.reshape(b, t, k_heads, d)
        v = v.reshape(b, t, k_heads, d)

        q, k = apply_rope(q, k, cos, sin)

        if page_tables is not None:
            # Paged decode (t == 1) or speculative verify window (t > 1):
            # attention reads K/V pages straight from the pool
            # (cache_k/cache_v are this layer's (P, K, page, D) pool
            # slices) via the page table inside the Pallas kernel — no
            # transient gathered window (serving/paged_kv.py seam). The new
            # tokens' K/V join as extra slot-causal softmax columns and are
            # RETURNED (not written): the server scatters the rows into the
            # pool after the tick, keeping the decoder pool-read-only.
            # Rows squeeze the window axis at t == 1 (the decode tick's
            # (L, B, K, D) contract); verify windows keep (B, t, K, D).
            from ..ops.attention import paged_attention

            if cache_k_scale is not None:
                # int8 pool: quantize the new rows for the server's scatter
                # and attend with their dequant-roundtrip, so this tick sees
                # exactly what the next tick will read back from the pool
                # (matching the dense int8 cache's write-then-read order).
                from ..ops.quant import dequantize_kv, quantize_kv

                k_q, k_s = quantize_kv(k)
                v_q, v_s = quantize_kv(v)
                out = paged_attention(
                    q, cache_k, cache_v, page_tables, kv_mask, cache_index,
                    dequantize_kv(k_q, k_s, q.dtype),
                    dequantize_kv(v_q, v_s, q.dtype),
                    pool_k_scale=cache_k_scale, pool_v_scale=cache_v_scale,
                    impl=cfg.attention_impl,
                )
                if t == 1:
                    new_cache = (k_q[:, 0], v_q[:, 0], k_s[:, 0], v_s[:, 0])
                else:
                    new_cache = (k_q, v_q, k_s, v_s)
            else:
                out = paged_attention(
                    q, cache_k, cache_v, page_tables, kv_mask, cache_index,
                    k, v, impl=cfg.attention_impl,
                )
                if t == 1:
                    new_cache = (k[:, 0], v[:, 0], None, None)
                else:
                    new_cache = (k, v, None, None)
            out = out.reshape(b, t, n * d)
            if quantized:
                proj = dense_apply(
                    out, self.variables["params"]["o_proj"], cfg.dtype,
                    act_quant=aq,
                )
            else:
                proj = dense(cfg.hidden_size, False, "o_proj")(out)
            return _lora_delta(self, proj, out, "o_proj"), new_cache

        if cache_k is not None:
            # Per-example cursor: vmap the slice update over the batch.
            update_row = jax.vmap(
                lambda buf, new, idx: jax.lax.dynamic_update_slice(
                    buf, new, (idx, 0, 0)
                )
            )
            if cache_k.dtype == jnp.int8:
                # int8 cache: quantize the new tokens' K/V at write (per
                # position x kv head scales), dequantize the whole window at
                # read — the convert/scale fuses into the attention dots.
                from ..ops.quant import dequantize_kv, quantize_kv

                k_q, k_s = quantize_kv(k)
                v_q, v_s = quantize_kv(v)
                cache_k = update_row(cache_k, k_q, cache_index)
                cache_v = update_row(cache_v, v_q, cache_index)
                scale_row = jax.vmap(
                    lambda buf, new, idx: jax.lax.dynamic_update_slice(
                        buf, new, (idx, 0)
                    )
                )
                cache_k_scale = scale_row(cache_k_scale, k_s, cache_index)
                cache_v_scale = scale_row(cache_v_scale, v_s, cache_index)
                k = dequantize_kv(cache_k, cache_k_scale, q.dtype)
                v = dequantize_kv(cache_v, cache_v_scale, q.dtype)
                new_cache = (cache_k, cache_v, cache_k_scale, cache_v_scale)
            else:
                k = update_row(cache_k, k.astype(cache_k.dtype), cache_index)
                v = update_row(cache_v, v.astype(cache_v.dtype), cache_index)
                new_cache = (k, v, None, None)
        else:
            new_cache = (None, None, None, None)

        out = attention(
            q,
            k.astype(q.dtype),
            v.astype(q.dtype),
            bias=bias,
            kv_mask=kv_mask,
            causal=self.causal,
            impl=cfg.attention_impl,
        )
        out = out.reshape(b, t, n * d)
        if quantized:
            proj = dense_apply(
                out, self.variables["params"]["o_proj"], cfg.dtype, act_quant=aq
            )
        else:
            proj = dense(cfg.hidden_size, False, "o_proj")(out)
        return _lora_delta(self, proj, out, "o_proj"), new_cache


class Qwen2MLP(nn.Module):
    cfg: Qwen2Config

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg

        def dense(feats, name):
            return nn.Dense(
                feats, use_bias=False, dtype=cfg.dtype,
                param_dtype=cfg.param_dtype, name=name,
            )

        quantized = cfg.quantization != "none" and not self.is_initializing()
        aq = cfg.quantization == "w8a8"
        if self.is_initializing() or not (cfg.fused_projections or quantized):
            gate = dense(cfg.intermediate_size, "gate_proj")(x)
            up = dense(cfg.intermediate_size, "up_proj")(x)
        elif cfg.fused_projections:
            p = self.variables["params"]
            gu = fused_dense_apply(
                x, [p["gate_proj"], p["up_proj"]], cfg.dtype, act_quant=aq
            )
            gate, up = jnp.split(gu, 2, axis=-1)
        else:
            p = self.variables["params"]
            gate = dense_apply(x, p["gate_proj"], cfg.dtype, act_quant=aq)
            up = dense_apply(x, p["up_proj"], cfg.dtype, act_quant=aq)
        gate = _lora_delta(self, gate, x, "gate_proj")
        up = _lora_delta(self, up, x, "up_proj")
        h = nn.silu(gate) * up
        if quantized:
            down = dense_apply(
                h, self.variables["params"]["down_proj"], cfg.dtype, act_quant=aq
            )
        else:
            down = dense(cfg.hidden_size, "down_proj")(h)
        return _lora_delta(self, down, h, "down_proj")


class RMSNorm(nn.Module):
    dim: int
    eps: float
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,), self.param_dtype)
        return rms_norm(x, w, self.eps)


class Qwen2Block(nn.Module):
    cfg: Qwen2Config
    causal: bool = True

    @nn.compact
    def __call__(self, x, bias, kv_mask, cos, sin, cache_k, cache_v,
                 cache_k_scale, cache_v_scale, cache_index, page_tables=None):
        cfg = self.cfg
        h = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps, cfg.param_dtype,
                    name="input_layernorm")(x)
        attn_out, new_cache = Qwen2Attention(cfg, self.causal, name="self_attn")(
            h, bias, kv_mask, cos, sin, cache_k, cache_v,
            cache_k_scale, cache_v_scale, cache_index, page_tables
        )
        x = x + attn_out
        h = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps, cfg.param_dtype,
                    name="post_attention_layernorm")(x)
        x = x + Qwen2MLP(cfg, name="mlp")(h)
        return x, new_cache


class Qwen2Model(nn.Module):
    """Decoder stack: embeddings + blocks + final norm.

    Returns post-final-norm hidden states, matching HF's
    ``outputs.hidden_states[-1]`` which the reference pools
    (``fastvlm_adapter.py:551-560``). When ``compute_tied_logits`` is set,
    also returns logits via the (tied) embedding matrix.
    """

    cfg: Qwen2Config

    def setup(self):
        # Declared in setup (not compact) so composites like FastVLM can call
        # ``embed()`` standalone to build the text half of a multimodal splice.
        self.embed_tokens = nn.Embed(
            self.cfg.vocab_size,
            self.cfg.hidden_size,
            dtype=self.cfg.dtype,
            param_dtype=self.cfg.param_dtype,
        )

    def embed(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """Token ids -> embeddings, using the decoder's own embedding table."""
        return self.embed_tokens(input_ids)

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray | None = None,  # (B, T)
        inputs_embeds: jnp.ndarray | None = None,  # (B, T, H)
        attention_mask: jnp.ndarray | None = None,  # (B, T) 1 = real token
        positions: jnp.ndarray | None = None,  # (B, T)
        cache: dict | None = None,
        causal: bool = True,
        compute_tied_logits: bool = False,
    ):
        cfg = self.cfg
        embed = self.embed_tokens
        if inputs_embeds is None:
            inputs_embeds = embed(input_ids)
        x = inputs_embeds.astype(cfg.dtype)
        b, t, _ = x.shape

        if attention_mask is None:
            attention_mask = jnp.ones((b, t), jnp.int32)
        if positions is None:
            if cache is not None:
                # Two position systems, decoupled for ragged batches:
                # - RoPE positions continue each example's TRUE length (count
                #   of valid cache entries), so decode after a right-padded
                #   prefill rotates at position len_i, not padded-width.
                # - Causality runs on SLOT indices (where K/V physically sit
                #   in the cache), so a new token always sees itself and all
                #   valid earlier slots; padded slots stay masked by kv_mask.
                counts = jnp.sum(cache["mask"].astype(jnp.int32), axis=1)  # (B,)
                positions = counts[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
            else:
                positions = jnp.broadcast_to(
                    jnp.arange(t, dtype=jnp.int32)[None, :], (b, t)
                )

        cos, sin = rope_cos_sin(positions, cfg.resolved_head_dim, cfg.rope_theta, cfg.dtype)

        paged = cache is not None and "pool_k" in cache
        if paged:
            # Paged decode: the cache dict carries the page pool itself
            # ({"pool_k","pool_v"}: (L, P, K, page, D), "tables": (B, P_slot),
            # "mask": (B, S_max) stored validity, "index": (B,) cursors).
            # Attention masking happens inside the paged kernel/fallback, so
            # no bias is built here; RoPE positions above already continue
            # each slot's true valid count from cache["mask"].
            kv_mask = cache["mask"].astype(jnp.int32)
            bias = None
            attn_kv_mask = kv_mask
            cache_k, cache_v = cache["pool_k"], cache["pool_v"]
            cache_index = cache["index"]
            # int8 pools carry (L, P, K, page) scale pools; the kernel
            # folds them into scores/probs (ops/pallas/paged_attention).
            cache_ks = cache.get("pool_k_scale")
            cache_vs = cache.get("pool_v_scale")
            page_tables = cache["tables"]
        elif cache is not None:
            # KV-cached decode: arbitrary query positions vs the whole cache
            # -> additive-bias (XLA) attention path.
            s = cache["k"].shape[2]
            kv_mask = jax.vmap(
                lambda row, new, idx: jax.lax.dynamic_update_slice(
                    row, new, (idx,)
                )
            )(
                cache["mask"].astype(jnp.int32),
                attention_mask.astype(jnp.int32),
                cache["index"],
            )
            kv_positions = jnp.broadcast_to(
                jnp.arange(s, dtype=jnp.int32)[None, :], (b, s)
            )
            # Causality by SLOT index (see the positions comment above): the
            # query written at slot index_b+i may attend slots <= index_b+i.
            slot_positions = (
                cache["index"][:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
            )
            bias = make_attention_bias(
                slot_positions, kv_positions, kv_mask, causal=causal
            )
            attn_kv_mask = None
            cache_k, cache_v, cache_index = cache["k"], cache["v"], cache["index"]
            cache_ks = cache.get("k_scale")
            cache_vs = cache.get("v_scale")
            page_tables = None
        else:
            # Prefill: structured mask (key padding + causal-by-position) ->
            # eligible for the Pallas flash kernel on TPU.
            kv_mask = attention_mask
            bias = None
            attn_kv_mask = kv_mask
            cache_k = cache_v = cache_index = None
            cache_ks = cache_vs = None
            page_tables = None

        block_cls = Qwen2Block
        if cfg.remat:
            block_cls = nn.remat(Qwen2Block, prevent_cse=False)

        if cfg.scan_layers:
            scanned = nn.scan(
                block_cls,
                # "lora" rides the same per-layer stacking as the params
                # (adapter A/B leaves carry a leading (L, ...) axis —
                # io/lora.init_lora builds them to match).
                variable_axes={"params": 0, "lora": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast,
                         nn.broadcast, 0, 0, 0, 0, nn.broadcast, nn.broadcast),
                out_axes=0,
                length=cfg.num_hidden_layers,
            )
            x, stacked_cache = scanned(cfg, causal, name="layers")(
                x, bias, attn_kv_mask, cos, sin, cache_k, cache_v,
                cache_ks, cache_vs, cache_index, page_tables
            )
            new_k, new_v, new_kscale, new_vscale = stacked_cache
        else:
            new_ks, new_vs, new_kss, new_vss = [], [], [], []
            for i in range(cfg.num_hidden_layers):
                ck = cache_k[i] if cache_k is not None else None
                cv = cache_v[i] if cache_v is not None else None
                cks = cache_ks[i] if cache_ks is not None else None
                cvs = cache_vs[i] if cache_vs is not None else None
                x, (nk, nv, nks, nvs) = block_cls(cfg, causal, name=f"layers_{i}")(
                    x, bias, attn_kv_mask, cos, sin, ck, cv, cks, cvs,
                    cache_index, page_tables
                )
                new_ks.append(nk)
                new_vs.append(nv)
                new_kss.append(nks)
                new_vss.append(nvs)
            new_k = jnp.stack(new_ks) if new_ks and new_ks[0] is not None else None
            new_v = jnp.stack(new_vs) if new_vs and new_vs[0] is not None else None
            new_kscale = (
                jnp.stack(new_kss) if new_kss and new_kss[0] is not None else None
            )
            new_vscale = (
                jnp.stack(new_vss) if new_vss and new_vss[0] is not None else None
            )

        x = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps, cfg.param_dtype, name="norm")(x)

        new_cache = None
        if paged:
            # (L, B, K, D) new K/V rows for the caller to scatter into the
            # pool at (tables[b, index // page], index % page); int8 pools
            # add the rows' (L, B, K) scales for the scale-pool scatter.
            new_cache = {"k_rows": new_k, "v_rows": new_v}
            if new_kscale is not None:
                new_cache["k_scale_rows"] = new_kscale
                new_cache["v_scale_rows"] = new_vscale
        elif cache is not None:
            new_cache = {
                "k": new_k,
                "v": new_v,
                "mask": kv_mask.astype(jnp.bool_),
                "index": cache["index"] + t,
            }
            if new_kscale is not None:
                new_cache["k_scale"] = new_kscale
                new_cache["v_scale"] = new_vscale

        logits = embed.attend(x) if compute_tied_logits else None
        return x, new_cache, logits


class Qwen2ForCausalLM(nn.Module):
    """LM head on top of Qwen2Model (tied embeddings for 0.5B/1.5B)."""

    cfg: Qwen2Config

    @nn.compact
    def __call__(self, input_ids=None, inputs_embeds=None, attention_mask=None,
                 positions=None, cache=None, causal: bool = True):
        hidden, new_cache, tied_logits = Qwen2Model(self.cfg, name="model")(
            input_ids=input_ids,
            inputs_embeds=inputs_embeds,
            attention_mask=attention_mask,
            positions=positions,
            cache=cache,
            causal=causal,
            compute_tied_logits=self.cfg.tie_word_embeddings,
        )
        if self.cfg.tie_word_embeddings:
            logits = tied_logits
        elif self.cfg.quantization != "none" and not self.is_initializing():
            logits = dense_apply(
                hidden, self.variables["params"]["lm_head"], self.cfg.dtype,
                act_quant=self.cfg.quantization == "w8a8",
            )
        else:
            logits = nn.Dense(
                self.cfg.vocab_size,
                use_bias=False,
                dtype=self.cfg.dtype,
                param_dtype=self.cfg.param_dtype,
                name="lm_head",
            )(hidden)
        return logits, hidden, new_cache
