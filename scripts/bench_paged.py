#!/usr/bin/env python
"""Paged vs dense serving decode tick (VERDICT r2 #3/#2 measurement).

Measures the steady-state decode tick p50 at matched slots/lengths for:

- the dense ``GenerationServer`` (slots x max_len preallocated KV),
- ``PagedGenerationServer`` with ``decode_impl="gathered"`` (round-2 path:
  pool -> transient logical window -> dense decode program),
- ``PagedGenerationServer`` with ``decode_impl="kernel"`` (round-3 Pallas
  paged-attention: pool read in place, rows-only decode program),

plus the persistent-HBM accounting that motivates paging. All slots stay
occupied for the measured ticks (eos disabled), so every tick decodes the
full batch. Each ``step()`` call ends in a host fetch of the sampled tokens
(the only sync that provably awaits execution on the tunneled backend —
CLAUDE.md), which is also what a real serving loop does.

Usage:
    python scripts/bench_paged.py                  # TPU, 0.5B, 16 slots
    python scripts/bench_paged.py --device cpu --model-id fastvlm-tiny \
        --num-slots 3 --prompt-len 8 --image-size 64 --ticks 4   # smoke
"""

from __future__ import annotations

import json
import sys
import time
from dataclasses import dataclass

import _bootstrap  # noqa: F401

import numpy as np

from vla_fastvlm_tpu.utils.cli import parse_cli


@dataclass
class Args:
    model_id: str = "fastvlm-0.5b"
    image_size: int = 256
    num_slots: int = 16
    prompt_len: int = 32
    max_new_tokens: int = 64
    page_size: int = 16
    ticks: int = 20
    warmup: int = 4
    kv_cache_quantization: str = "none"  # "int8" halves pool bytes everywhere
    dtype: str = "bfloat16"
    device: str | None = None
    impls: str = "dense,gathered,kernel"  # comma-separated subset
    seed: int = 0


def _requests(n, prompt_len, size, rng):
    out = []
    for _ in range(n):
        length = int(rng.integers(max(2, prompt_len // 2), prompt_len + 1))
        ids = np.zeros((1, prompt_len), np.int32)
        mask = np.zeros((1, prompt_len), np.int32)
        ids[0, :length] = rng.integers(3, 1000, length)
        mask[0, :length] = 1
        img = rng.random((1, 3, size, size), dtype=np.float32)
        out.append((ids, mask, img))
    return out


def _tick_p50(server, reqs, warmup, ticks):
    for ids, mask, img in reqs:
        server.submit(ids, mask, img)
    server.flush()
    for _ in range(warmup):
        server.step()
    times = []
    for _ in range(ticks):
        t0 = time.perf_counter()
        server.step()
        times.append(time.perf_counter() - t0)
    if server.num_active == 0:
        raise RuntimeError(
            "slots drained during measurement; raise --max-new-tokens"
        )
    return sorted(times)[len(times) // 2]


def _bytes(tree) -> int:
    import jax

    return sum(l.nbytes for l in jax.tree_util.tree_leaves(tree))


def _device_burst(server, paged: bool, n: int = 16):
    """Device-side tick cost: ``n`` decode programs chained back-to-back
    (tick i's sampled tokens feed tick i+1 — a data dependency, so the
    tunnel's async dispatch cannot elide them) with ONE final host fetch.
    Amortizes the ~30 ms RTT that dominates per-step timings here. Also
    returns the compiled decode program's temp-allocation bytes (the
    gathered path's transient window shows up exactly there).

    Mutates the server's device state (donated buffers) — call last.
    """
    import jax
    import jax.numpy as jnp

    if paged:
        lengths = np.array(
            [s.length if s.active else 1 for s in server._slots], np.int32
        )
        masks = server._slot_mask.copy()
        for i, s in enumerate(server._slots):
            if not s.active:
                masks[i] = False
                masks[i, 0] = True
        tables = jnp.asarray(server.pool.page_table)
        masks_j = jnp.asarray(masks)
        lengths_j = jnp.asarray(lengths)
        tokens = jnp.asarray(server._pending_token)
        pools = server.pool.pools()
        args = (server.params, pools, tables, masks_j, lengths_j, tokens,
                server._next_key())
        stats = server._decode.lower(*args).compile().memory_analysis()
        t0 = time.perf_counter()
        for _ in range(n):
            tokens, pools = server._decode(
                server.params, pools, tables, masks_j, lengths_j, tokens,
                server._next_key(),
            )
        np.asarray(tokens)
        elapsed = time.perf_counter() - t0
    else:
        cache = server.cache
        tokens = jnp.asarray(server._pending_token)
        args = (server.params, tokens, cache, server._next_key())
        stats = server._decode.lower(*args).compile().memory_analysis()
        t0 = time.perf_counter()
        for _ in range(n):
            tokens, cache = server._decode(
                server.params, tokens, cache, server._next_key()
            )
        np.asarray(tokens)
        elapsed = time.perf_counter() - t0
    temp_mb = (
        round(stats.temp_size_in_bytes / 1e6, 2) if stats is not None else None
    )
    return elapsed / n, temp_mb


def main(args: Args) -> None:
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    import jax

    from vla_fastvlm_tpu.device import enable_compilation_cache
    from vla_fastvlm_tpu.model.fastvlm_adapter import (
        FastVLMBackbone,
        FastVLMBackboneConfig,
    )
    from vla_fastvlm_tpu.serving import GenerationServer
    from vla_fastvlm_tpu.serving.paged_kv import PagedGenerationServer

    enable_compilation_cache()
    backbone = FastVLMBackbone(
        FastVLMBackboneConfig(
            model_id=args.model_id,
            force_image_size=args.image_size,
            dtype=args.dtype,
            param_dtype=args.dtype,
            kv_cache_quantization=args.kv_cache_quantization,
        )
    )
    model, params = backbone.model, backbone.params
    size = backbone.model_config.image_size
    rng = np.random.default_rng(args.seed)
    reqs = _requests(args.num_slots, args.prompt_len, size, rng)
    if args.warmup + args.ticks >= args.max_new_tokens - 1:
        raise SystemExit("need max_new_tokens > warmup + ticks + 1")

    common = dict(
        num_slots=args.num_slots,
        prompt_len=args.prompt_len,
        max_new_tokens=args.max_new_tokens,
        eos_token_id=-1,
        prefill_batch=min(4, args.num_slots),
    )
    results = {}
    mem = {}
    for impl in args.impls.split(","):
        t0 = time.perf_counter()
        if impl == "dense":
            server = GenerationServer(model, params, **common)
            mem["dense_cache_gb"] = round(_bytes(server.cache) / 1e9, 4)
        else:
            server = PagedGenerationServer(
                model, params, page_size=args.page_size,
                decode_impl=impl, **common,
            )
            mem.setdefault(
                "paged_pool_gb", round(_bytes(server.pool.pools()) / 1e9, 4)
            )
        p50 = _tick_p50(server, reqs, args.warmup, args.ticks)
        if impl != "dense":
            used = int(np.count_nonzero(server.pool.page_table))
            page_bytes = _bytes(server.pool.pools()) / server.pool.num_pages
            mem.setdefault(
                "paged_allocated_gb", round(used * page_bytes / 1e9, 4)
            )
        device_ms, temp_mb = _device_burst(server, impl != "dense")
        results[impl] = round(p50 * 1e3, 2)
        results[f"{impl}_device"] = round(device_ms * 1e3, 2)
        mem[f"{impl}_decode_temp_mb"] = temp_mb
        print(
            f"[paged-bench] {impl}: p50 tick {p50 * 1e3:.1f} ms, "
            f"device tick {device_ms * 1e3:.2f} ms, temp {temp_mb} MB "
            f"({args.num_slots} slots; setup+compile "
            f"{time.perf_counter() - t0:.0f}s)",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": (
                    f"decode tick p50 ({args.model_id}, {args.num_slots} "
                    f"slots, prompt {args.prompt_len}, page {args.page_size})"
                ),
                "unit": "ms",
                "ticks_ms": results,
                **mem,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main(parse_cli(Args, prog="bench_paged.py"))
