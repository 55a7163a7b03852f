#!/usr/bin/env python
"""Chunked prefill: what it buys the decode tick tail, measured.

Chunked admission (``PagedGenerationServer(prefill_chunk_tokens=N)``)
bounds how long an arriving request stalls in-flight decodes: each serving
tick does at most one admission chunk (vision encode as its own program,
then N prompt tokens at a time) instead of a whole vision+prefill program.
The cost is more program dispatches per admission; the win is tick-tail
latency for requests already decoding. This script measures both sides
under a steady arrival load:

- p50 / p99 / max tick over the run (tick = ``step()`` wall time),
- admission ticks vs pure-decode ticks, separately,
- end-to-end wall time (the dispatch-overhead side of the trade).

Run for each --chunk value (0 = unchunked baseline) and compare rows.

Usage:
    python scripts/bench_chunked_prefill.py                  # TPU, 0.5B
    python scripts/bench_chunked_prefill.py --device cpu --model-id \
        fastvlm-tiny --image-size 64 --prompt-len 8 --chunks 0,4 \
        --num-requests 8 --max-new-tokens 6 --num-slots 4     # smoke
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
    prompt_len: int = 256
    max_new_tokens: int = 96
    page_size: int = 16
    prefill_batch: int = 4
    # Comma-separated chunk sizes; 0 = unchunked admission.
    chunks: str = "0,32"
    num_requests: int = 32
    # New arrivals are offered every this many ticks (up to free slots).
    arrival_period: int = 4
    arrivals_per_burst: int = 4
    quantization: str = "none"
    dtype: str = "bfloat16"
    device: Optional[str] = None
    seed: int = 0


def _request(rng, prompt_len, size):
    length = int(rng.integers(max(2, prompt_len * 3 // 4), prompt_len + 1))
    ids = np.zeros((1, prompt_len), np.int32)
    mask = np.zeros((1, prompt_len), np.int32)
    ids[0, :length] = rng.integers(3, 1000, length)
    mask[0, :length] = 1
    img = rng.random((1, 3, size, size), dtype=np.float32)
    return ids, mask, img


def _run(make_server, args, size, chunk):
    server = make_server(chunk)
    rng = np.random.default_rng(args.seed)
    reqs = [_request(rng, args.prompt_len, size) for _ in range(args.num_requests)]
    queue = list(reqs)

    # Warm the compiled programs (admission + decode) outside the timed run.
    server.submit(*queue[0])
    server.flush()
    server.step()
    while server.num_active:
        server.step()

    queue = list(reqs)
    admission_ticks, decode_ticks, all_ticks = [], [], []
    finished: dict = {}
    tick_no = 0
    t_start = time.perf_counter()
    while len(finished) < args.num_requests:
        if tick_no % args.arrival_period == 0:
            offered = 0
            while (
                queue
                and server.has_free_slot()
                and offered < args.arrivals_per_burst
            ):
                server.submit(*queue.pop(0))
                offered += 1
        admitting = bool(
            server._pending or getattr(server, "_inflight", None) is not None
        )
        t0 = time.perf_counter()
        finished.update(server.step())
        dt = time.perf_counter() - t0
        all_ticks.append(dt)
        (admission_ticks if admitting else decode_ticks).append(dt)
        tick_no += 1
    wall = time.perf_counter() - t_start

    def ms(x):
        return round(float(x) * 1e3, 2)

    ticks = np.array(all_ticks)
    return {
        "chunk": chunk,
        "ticks": len(ticks),
        "p50_ms": ms(np.percentile(ticks, 50)),
        "p99_ms": ms(np.percentile(ticks, 99)),
        "max_ms": ms(ticks.max()),
        "admission_tick_p50_ms": ms(np.median(admission_ticks))
        if admission_ticks
        else None,
        "decode_tick_p50_ms": ms(np.median(decode_ticks))
        if decode_ticks
        else None,
        "wall_s": round(wall, 3),
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
    size = backbone.model_config.image_size

    def make_server(chunk: int):
        return PagedGenerationServer(
            backbone.model,
            backbone.params,
            num_slots=args.num_slots,
            prompt_len=args.prompt_len,
            max_new_tokens=args.max_new_tokens,
            eos_token_id=-1,
            page_size=args.page_size,
            prefill_batch=args.prefill_batch,
            prefill_chunk_tokens=chunk,
            seed=args.seed,
        )

    rows = []
    for chunk in (int(c) for c in args.chunks.split(",")):
        t0 = time.perf_counter()
        row = _run(make_server, args, size, chunk)
        rows.append(row)
        print(
            f"[chunked-bench] chunk={chunk}: {row} "
            f"(leg {time.perf_counter() - t0:.0f}s incl. compile)",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": (
                    f"chunked-prefill tick tail ({args.model_id}, prompt "
                    f"{args.prompt_len}, slots {args.num_slots})"
                ),
                "unit": "ms",
                "rows": rows,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main(parse_cli(Args, prog="bench_chunked_prefill.py"))
