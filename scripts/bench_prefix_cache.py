#!/usr/bin/env python
"""Prefix-cache benefit on the paged server: hit vs miss admission latency.

Automatic prefix caching (``PagedGenerationServer(prefix_cache_size=N)``)
lets a repeated (prompt, image) request skip the prefill program — vision
encode + projector + full prompt prefill — and install shared prompt pages
by refcount with a copy-on-write tail page. This script measures what that
buys on the chip:

- **miss admission**: submit one novel request + ``flush()`` (runs the
  batched prefill program) — the uncached time-to-first-token.
- **hit admission**: submit the same bytes again + ``flush()`` (page
  install + cached-logits sample; no prefill program).
- **+tick** variants add one ``step()`` after the flush: the decode tick's
  token fetch awaits every outstanding dispatch, including the hit path's
  asynchronous COW page copy — so hit+tick vs miss+tick is the honest
  end-to-end delta (CLAUDE.md: only device->host fetches await execution
  on the tunneled backend).
- **mixed load**: the serve.py request schedule (repeat fraction over a
  shared prompt) run to completion with the cache on vs off — wall time
  and p50 tick.

Usage:
    python scripts/bench_prefix_cache.py                   # TPU, 0.5B
    python scripts/bench_prefix_cache.py --device cpu --model-id \
        fastvlm-tiny --image-size 64 --prompt-len 8 --iters 2 \
        --num-requests 8 --max-new-tokens 4                # smoke
"""

from __future__ import annotations

import json
import sys
import time
from dataclasses import dataclass
from typing import Optional

import _bootstrap  # noqa: F401

import numpy as np

from vla_fastvlm_tpu.utils.cli import parse_cli


@dataclass
class Args:
    model_id: str = "fastvlm-0.5b"
    image_size: Optional[int] = 256
    num_slots: int = 16
    prompt_len: int = 32
    max_new_tokens: int = 64
    page_size: int = 16
    prefill_batch: int = 4
    prefix_cache: int = 8
    iters: int = 12
    warmup: int = 2
    # Mixed-load leg (serve.py schedule): 0 disables.
    num_requests: int = 48
    repeat_fraction: float = 0.75
    arrivals_per_tick: int = 2
    quantization: str = "none"
    dtype: str = "bfloat16"
    device: Optional[str] = None
    seed: int = 0


def _request(rng, prompt_len, size):
    length = int(rng.integers(max(2, prompt_len // 2), prompt_len + 1))
    ids = np.zeros((1, prompt_len), np.int32)
    mask = np.zeros((1, prompt_len), np.int32)
    ids[0, :length] = rng.integers(3, 1000, length)
    mask[0, :length] = 1
    img = rng.random((1, 3, size, size), dtype=np.float32)
    return ids, mask, img


def _drain(server):
    while server.num_active:
        server.step()


def _admission_p50s(make_server, rng, prompt_len, size, iters, warmup):
    """p50 (miss, hit, partial, miss+tick, hit+tick) admission latencies.

    "partial" is the page-level layer: a request sharing ~3/4 of the
    prompt (page-aligned prefix, same image) but with a DIFFERENT suffix —
    it installs the shared pages and prefills only the tail text chunks
    (vision encode skipped)."""
    server = make_server(prefix_cache=max(2, 2 * (iters + warmup) + 2))
    miss, hit, partial, miss_tick, hit_tick = [], [], [], [], []
    shared_len = max(1, (3 * prompt_len) // 4)
    for i in range(warmup + iters):
        ids = rng.integers(3, 1000, (1, prompt_len)).astype(np.int32)
        mask = np.ones((1, prompt_len), np.int32)
        img = rng.random((1, 3, size, size), dtype=np.float32)
        req = (ids, mask, img)

        t0 = time.perf_counter()
        server.submit(*req)
        server.flush()
        t_miss = time.perf_counter() - t0
        t0 = time.perf_counter()
        server.step()
        t_miss_tick = t_miss + (time.perf_counter() - t0)
        _drain(server)

        t0 = time.perf_counter()
        server.submit(*req)
        server.flush()
        t_hit = time.perf_counter() - t0
        t0 = time.perf_counter()
        server.step()
        t_hit_tick = t_hit + (time.perf_counter() - t0)
        _drain(server)

        ids2 = ids.copy()
        ids2[0, shared_len:] = rng.integers(3, 1000, prompt_len - shared_len)
        t0 = time.perf_counter()
        server.submit(ids2, mask, img)
        server.flush()
        t_partial = time.perf_counter() - t0
        _drain(server)

        if i >= warmup:
            miss.append(t_miss)
            hit.append(t_hit)
            partial.append(t_partial)
            miss_tick.append(t_miss_tick)
            hit_tick.append(t_hit_tick)
    assert server.prefix_cache_hits >= iters, (
        server.prefix_cache_hits,
        server.prefix_cache_misses,
    )
    assert server.prefix_cache_partial_hits >= iters, (
        server.prefix_cache_partial_hits,
        server.prefix_cache_misses,
    )

    def p50(xs):
        return round(sorted(xs)[len(xs) // 2] * 1e3, 2)

    return p50(miss), p50(hit), p50(partial), p50(miss_tick), p50(hit_tick)


def _mixed_load(make_server, args, size, prefix_cache):
    """serve.py schedule: wall time + p50 tick + hit ratio."""
    server = make_server(prefix_cache=prefix_cache)
    rng = np.random.default_rng(args.seed + 1)
    shared = None

    def make_request():
        nonlocal shared
        if shared is not None and rng.random() < args.repeat_fraction:
            return shared
        req = _request(rng, args.prompt_len, size)
        if shared is None:
            shared = req
        return req

    submitted = 0
    finished: dict = {}
    ticks = []
    t_start = time.perf_counter()
    while len(finished) < args.num_requests:
        arrivals = 0
        while (
            submitted < args.num_requests
            and server.has_free_slot()
            and arrivals < args.arrivals_per_tick
        ):
            server.submit(*make_request())
            submitted += 1
            arrivals += 1
        t0 = time.perf_counter()
        finished.update(server.step())
        ticks.append(time.perf_counter() - t0)
    wall = time.perf_counter() - t_start
    return {
        "wall_s": round(wall, 3),
        "p50_tick_ms": round(float(np.median(ticks)) * 1e3, 2),
        "hits": server.prefix_cache_hits,
        "misses": server.prefix_cache_misses,
    }


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
    from vla_fastvlm_tpu.serving import PagedGenerationServer

    enable_compilation_cache()
    backbone = FastVLMBackbone(
        FastVLMBackboneConfig(
            model_id=args.model_id,
            force_image_size=args.image_size,
            dtype=args.dtype,
            param_dtype=args.dtype,
            quantization=args.quantization,
            seed=args.seed,
        )
    )
    model, params = backbone.model, backbone.params
    size = backbone.model_config.image_size

    def make_server(prefix_cache: int):
        return PagedGenerationServer(
            model,
            params,
            num_slots=args.num_slots,
            prompt_len=args.prompt_len,
            max_new_tokens=args.max_new_tokens,
            eos_token_id=-1,
            page_size=args.page_size,
            prefill_batch=args.prefill_batch,
            prefix_cache_size=prefix_cache,
            seed=args.seed,
        )

    rng = np.random.default_rng(args.seed)
    t0 = time.perf_counter()
    miss, hit, partial, miss_tick, hit_tick = _admission_p50s(
        make_server, rng, args.prompt_len, size, args.iters, args.warmup
    )
    print(
        f"[prefix-bench] admission p50: miss {miss} ms vs whole hit {hit} "
        f"ms vs partial (page-level, ~3/4 shared) {partial} ms; "
        f"+first tick: {miss_tick} vs {hit_tick} ms "
        f"(setup+compile {time.perf_counter() - t0:.0f}s)",
        file=sys.stderr,
    )

    out = {
        "metric": (
            f"prefix-cache admission p50 ({args.model_id}, prompt "
            f"{args.prompt_len}, prefill_batch {args.prefill_batch})"
        ),
        "unit": "ms",
        "miss_ms": miss,
        "hit_ms": hit,
        "partial_hit_ms": partial,
        "miss_plus_tick_ms": miss_tick,
        "hit_plus_tick_ms": hit_tick,
    }
    if args.num_requests > 0:
        on = _mixed_load(make_server, args, size, args.prefix_cache)
        off = _mixed_load(make_server, args, size, 0)
        print(
            f"[prefix-bench] mixed load ({args.num_requests} reqs, repeat "
            f"{args.repeat_fraction}): cache ON {on} vs OFF {off}",
            file=sys.stderr,
        )
        out["mixed_on"] = on
        out["mixed_off"] = off
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))


if __name__ == "__main__":
    main(parse_cli(Args, prog="bench_prefix_cache.py"))
