#!/usr/bin/env python
"""Continuous-batching generation server demo/load CLI.

Drives ``serving.GenerationServer`` (slot-based continuous batching with
batched admission and donated in-place KV-cache updates) with a synthetic
request stream: requests arrive over time, prefill in admission batches, and
decode ticks run across all occupied slots. Reports admission latency,
per-tick latency, and aggregate token throughput — the serving-shape numbers
behind BASELINE.json config #5.

Offline smoke: python scripts/serve.py --device cpu --model-id fastvlm-tiny \
    --num-requests 6 --num-slots 3
"""

from __future__ import annotations

import json
import sys
import time
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

import _bootstrap  # noqa: F401

from vla_fastvlm_tpu.utils import configure_logging
from vla_fastvlm_tpu.utils.cli import parse_cli


@dataclass
class ServeArgs:
    model_id: str = "fastvlm-0.5b"
    num_slots: int = 8
    prefill_batch: int = 4
    prompt_len: int = 32
    max_new_tokens: int = 32
    num_requests: int = 16
    # New requests admitted per decode tick (arrival rate of the synthetic
    # stream); slots permitting.
    arrivals_per_tick: int = 2
    image_size: Optional[int] = None
    dtype: str = "bfloat16"
    device: Optional[str] = None
    seed: int = 0
    # Tensor-parallel mesh size (1 = single chip); shards params + KV cache.
    tp: int = 1
    # "int8" | "int4": weight-only quantized decoder kernels (io/quantize.py).
    # "w8a8": int8 weights + dynamic int8 activations (MXU 2x int8 path).
    quantization: str = "none"
    # "int8": int8 KV cache storage (dense AND paged servers; 2x slot/page
    # capacity at the same HBM budget).
    kv_cache_quantization: str = "none"
    # Sampling (0.0 = greedy); top_p < 1 applies nucleus filtering.
    temperature: float = 0.0
    top_p: float = 1.0
    # Paged KV cache: persistent HBM scales with allocated tokens instead of
    # slots x max_len (serving/paged_kv.py). Composes with --tp.
    paged: bool = False
    page_size: int = 16
    # Paged decode implementation: "kernel" = Pallas paged-attention (pool
    # read in place, no gathered window), "gathered" = round-2 window
    # program, "auto" = kernel except int8 pools / TP meshes.
    decode_impl: str = "auto"
    # Pool size in pages (default: every slot at max length + trash page).
    num_pages: Optional[int] = None
    # >0 enables automatic prefix caching over that many distinct prompts
    # (paged server only): repeated prompts skip prefill and share their
    # prompt pages copy-on-write (serving/paged_kv.py).
    prefix_cache: int = 0
    # Fraction of requests reusing one shared prompt (prefix-cache demo).
    repeat_fraction: float = 0.0
    # >0 = chunked prefill (paged server only): each tick does at most one
    # admission chunk of this many prompt tokens (vision encode is its own
    # chunk), bounding how long an arrival stalls in-flight decodes. Prompt
    # buckets must be multiples of the chunk. 0 = whole-prompt admission.
    prefill_chunk_tokens: int = 0
    # LoRA adapters over the frozen base (io/lora.py): each path is a policy
    # checkpoint dir trained with --lora-rank (its "lora" tree is loaded).
    # One path = that adapter on every request; multiple paths = multi-LoRA
    # (the synthetic stream round-robins requests over base + adapters).
    lora_dir: Tuple[str, ...] = ()
    # Speculative decoding: a small same-vocab draft model proposes
    # --spec-k tokens per tick, one target forward verifies — 1..k+1 tokens
    # emitted per slot per tick (serving/speculative.py). Greedy is exact
    # vs the plain servers; temperature > 0 uses rejection-sampling
    # verification (target-distribution exact). Composes with --paged
    # (+ --prefix-cache / --prefill-chunk-tokens / --kv-cache-quantization),
    # with --lora-dir (adapters mount on the TARGET's prefill/verify only;
    # the base-model draft just lowers acceptance, never exactness —
    # serving/speculative.py), and with --tp (target shards on the mesh,
    # draft replicates). E.g. --model-id fastvlm-7b
    # --quantization int8 --draft-model-id fastvlm-0.5b --paged.
    draft_model_id: Optional[str] = None
    spec_k: int = 4


def main(args: ServeArgs) -> None:
    if args.device:
        import os

        if args.tp > 1 and args.device == "cpu":
            flags = os.environ.get("XLA_FLAGS", "")
            if "host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    flags + f" --xla_force_host_platform_device_count={args.tp}"
                ).strip()
        import jax

        jax.config.update("jax_platforms", args.device)
    configure_logging()
    from vla_fastvlm_tpu.device import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from vla_fastvlm_tpu.model.fastvlm_adapter import (
        FastVLMBackbone,
        FastVLMBackboneConfig,
    )
    from vla_fastvlm_tpu.serving import GenerationServer

    backbone = FastVLMBackbone(
        FastVLMBackboneConfig(
            model_id=args.model_id,
            bootstrap_model_id=args.model_id,
            force_image_size=args.image_size,
            dtype=args.dtype,
            param_dtype=args.dtype,
            quantization=args.quantization,
            kv_cache_quantization=args.kv_cache_quantization,
            seed=args.seed,
        )
    )
    size = backbone.model_config.image_size
    lora = None
    num_adapters = 0
    if args.lora_dir:
        from vla_fastvlm_tpu.io.lora import load_lora

        adapters = [load_lora(d) for d in args.lora_dir]
        num_adapters = len(adapters)
        lora = adapters[0] if num_adapters == 1 else adapters
    mesh = None
    if args.tp > 1:
        from vla_fastvlm_tpu.parallel import make_mesh

        mesh = make_mesh(data=1, model=args.tp, devices=jax.devices()[: args.tp])
    if args.draft_model_id:
        from vla_fastvlm_tpu.serving import (
            SpeculativeGenerationServer,
            SpeculativePagedGenerationServer,
        )

        draft_backbone = FastVLMBackbone(
            FastVLMBackboneConfig(
                model_id=args.draft_model_id,
                bootstrap_model_id=args.draft_model_id,
                force_image_size=size,  # draft sees the same frames
                dtype=args.dtype,
                param_dtype=args.dtype,
                seed=args.seed + 1,
            )
        )
        common = dict(
            k=args.spec_k,
            num_slots=args.num_slots,
            prompt_len=args.prompt_len,
            max_new_tokens=args.max_new_tokens,
            eos_token_id=-1,  # synthetic stream: run to max length
            prefill_batch=args.prefill_batch,
            temperature=args.temperature,
            top_p=args.top_p,
            seed=args.seed,
            lora=lora,  # target-side adapters; the draft stays base
            mesh=mesh,  # TP: target shards, draft replicates
        )
        if args.paged:
            server = SpeculativePagedGenerationServer(
                backbone.model,
                backbone.params,
                draft_backbone.model,
                draft_backbone.params,
                page_size=args.page_size,
                num_pages=args.num_pages,
                prefix_cache_size=args.prefix_cache,
                prefill_chunk_tokens=args.prefill_chunk_tokens,
                **common,
            )
        else:
            server = SpeculativeGenerationServer(
                backbone.model,
                backbone.params,
                draft_backbone.model,
                draft_backbone.params,
                **common,
            )
    elif args.paged:
        from vla_fastvlm_tpu.serving import PagedGenerationServer

        server = PagedGenerationServer(
            backbone.model,
            backbone.params,
            num_slots=args.num_slots,
            prompt_len=args.prompt_len,
            max_new_tokens=args.max_new_tokens,
            eos_token_id=-1,
            page_size=args.page_size,
            num_pages=args.num_pages,
            mesh=mesh,
            temperature=args.temperature,
            top_p=args.top_p,
            seed=args.seed,
            prefill_batch=args.prefill_batch,
            decode_impl=args.decode_impl,
            prefix_cache_size=args.prefix_cache,
            prefill_chunk_tokens=args.prefill_chunk_tokens,
            lora=lora,
        )
    else:
        server = GenerationServer(
            backbone.model,
            backbone.params,
            num_slots=args.num_slots,
            prompt_len=args.prompt_len,
            max_new_tokens=args.max_new_tokens,
            eos_token_id=-1,  # synthetic stream: run to max length
            prefill_batch=args.prefill_batch,
            mesh=mesh,
            temperature=args.temperature,
            top_p=args.top_p,
            seed=args.seed,
            lora=lora,
        )

    rng = np.random.default_rng(args.seed)
    shared_request = None

    def make_request():
        nonlocal shared_request
        # VLA-style repeated task prompts: with --repeat-fraction p, a share
        # of requests reuse one fixed (prompt, image) — the prefix cache's
        # common case.
        if args.repeat_fraction > 0 and shared_request is not None:
            if rng.random() < args.repeat_fraction:
                return shared_request
        length = int(rng.integers(4, args.prompt_len + 1))
        ids = np.zeros((1, args.prompt_len), np.int32)
        mask = np.zeros((1, args.prompt_len), np.int32)
        ids[0, :length] = rng.integers(3, 250, length)
        mask[0, :length] = 1
        image = rng.random((1, 3, size, size), dtype=np.float32)
        if shared_request is None:
            shared_request = (ids, mask, image)
        return ids, mask, image

    submitted = 0
    finished: dict = {}
    tick_times = []
    t_start = time.perf_counter()
    while len(finished) < args.num_requests:
        arrivals = 0
        while (
            submitted < args.num_requests
            and server.has_free_slot()
            and arrivals < args.arrivals_per_tick
        ):
            if num_adapters > 1:
                # Round-robin tenants over base + adapters (multi-LoRA).
                cycle = submitted % (num_adapters + 1)
                server.submit(
                    *make_request(),
                    lora_index=None if cycle == 0 else cycle - 1,
                )
            else:
                server.submit(*make_request())
            submitted += 1
            arrivals += 1
        t0 = time.perf_counter()
        finished.update(server.step())
        tick_times.append(time.perf_counter() - t0)
    elapsed = time.perf_counter() - t_start

    total_tokens = sum(len(t) for t in finished.values())
    summary = {
        "requests": args.num_requests,
        "slots": args.num_slots,
        "prefill_batch": args.prefill_batch,
        "total_new_tokens": total_tokens,
        "tokens_per_sec": round(total_tokens / elapsed, 2),
        "p50_tick_ms": round(float(np.median(tick_times)) * 1e3, 2),
        "ticks": len(tick_times),
        "device": str(jax.devices()[0]),
    }
    if args.prefix_cache > 0 and args.paged:
        summary["prefix_cache_hits"] = server.prefix_cache_hits
        summary["prefix_cache_misses"] = server.prefix_cache_misses
    if num_adapters:
        summary["lora_adapters"] = num_adapters
    if args.draft_model_id:
        summary["spec_k"] = args.spec_k
        # decode amortization: tokens emitted per speculative round (plain
        # greedy serving is 1.0 by construction); server-tracked, so
        # admission-time first tokens are excluded
        summary["tokens_per_tick"] = round(server.tokens_per_tick, 2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main(parse_cli(ServeArgs, prog="serve.py"))
