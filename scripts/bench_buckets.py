#!/usr/bin/env python
"""Prompt-bucket prefill saving (VERDICT r2 #7 measurement).

Both servers compile one prefill program per configured bucket width and
pad each request to the smallest covering bucket
(``serving/continuous_batching.py::normalize_buckets``). This measures what
that buys: the device-side cost of one admission-batch prefill at each
bucket width (so a short prompt admitted through a small bucket vs padded
to the largest one), plus an end-to-end short-prompt load test through the
dense server under both configurations.

Methodology per CLAUDE.md: the tunneled backend only provably awaits a
device->host fetch, so the per-width prefill cost chains N programs with a
data dependency (sampled token i feeds the ids of prefill i+1) and one
final fetch, amortizing the ~30 ms RTT. End-to-end rows fetch every tick
(what a real serving loop does) and therefore include the RTT.

Usage:
    python scripts/bench_buckets.py                 # TPU, 0.5B
    python scripts/bench_buckets.py --device cpu --model-id fastvlm-tiny \
        --image-size 64 --buckets 8,16 --short-len 6 --chain 2 \
        --num-requests 4 --max-new-tokens 2        # smoke
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass

import _bootstrap  # noqa: F401

import numpy as np

from vla_fastvlm_tpu.utils.cli import parse_cli


@dataclass
class Args:
    model_id: str = "fastvlm-0.5b"
    image_size: int = 256
    buckets: str = "16,64,256"  # comma-separated compiled prefill widths
    short_len: int = 12  # request width for the end-to-end load test
    prefill_batch: int = 4
    num_slots: int = 16
    max_new_tokens: int = 8
    num_requests: int = 32
    chain: int = 16  # chained prefill programs per width measurement
    text_only: bool = False  # no images: isolates text prefill scaling
    dtype: str = "bfloat16"
    device: str | None = None
    seed: int = 0


def _build(args, prompt_len, cached=[]):
    import jax.numpy as jnp

    from vla_fastvlm_tpu.model.fastvlm_adapter import (
        FastVLMBackbone,
        FastVLMBackboneConfig,
    )
    from vla_fastvlm_tpu.serving import GenerationServer

    if not cached:
        backbone = FastVLMBackbone(
            FastVLMBackboneConfig(
                model_id=args.model_id,
                force_image_size=args.image_size,
                dtype=args.dtype,
                param_dtype=args.dtype,
                # text-only mode drops the visual prefix so the prefill cost
                # is the text tower alone (the bucket-scaling regime).
                image_token_mode="none" if args.text_only else "prefix",
            )
        )
        cached.append((backbone.model, backbone.params))
    model, params = cached[0]
    server = GenerationServer(
        model,
        params,
        num_slots=args.num_slots,
        prompt_len=prompt_len,
        max_new_tokens=args.max_new_tokens,
        eos_token_id=-1,  # never fires: slots stay occupied while measured
        prefill_batch=args.prefill_batch,
    )
    return model, params, server, jnp


def _prefill_burst(server, jnp, width, image_size, batch, chain, seed,
                   text_only=False):
    """Device cost of one admission-batch prefill at ``width``: ``chain``
    programs with a token->ids data dependency, one final fetch."""
    import jax

    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(3, 1000, (batch, width)), jnp.int32)
    mask = jnp.ones((batch, width), jnp.int32)
    images = None if text_only else jnp.asarray(
        rng.random((batch, 3, image_size, image_size), dtype=np.float32)
    )
    key = jax.random.PRNGKey(seed)

    def once(ids):
        return server._prefill(server.params, images, ids, mask, key)

    tokens, _, _ = once(ids)  # compile + warm
    np.asarray(tokens)
    t0 = time.perf_counter()
    for _ in range(chain):
        tokens, _, _ = once(ids.at[:, 0].set(tokens % 997 + 3))
    np.asarray(tokens)  # single fetch awaits the whole chain
    return (time.perf_counter() - t0) / chain


def _short_requests(n, width, size, rng, text_only=False):
    reqs = []
    for _ in range(n):
        ids = np.zeros((1, width), np.int32)
        ids[0] = rng.integers(3, 1000, width)
        mask = np.ones((1, width), np.int32)
        img = None if text_only else rng.random(
            (1, 3, size, size), dtype=np.float32
        )
        reqs.append((ids, mask, img))
    return reqs


def _run_load(args, prompt_len, reqs):
    """All-short-prompt stream through one server config; returns wall time
    after a warmup admission (compiles excluded) and tokens emitted."""
    _, _, server, _ = _build(args, prompt_len)
    # Warm every program (prefill at the short bucket, insert, decode).
    w_ids, w_mask, w_img = reqs[0]
    server.submit(w_ids, w_mask, w_img)
    server.run_to_completion()
    # Closed-loop client: submit while capacity allows (the server's
    # admission contract — submit raises when slots are exhausted), tick to
    # drain, repeat until every request completed.
    queue = list(reqs)
    done: dict = {}
    t0 = time.perf_counter()
    while queue or server.num_active:
        while queue and server.has_free_slot():
            ids, mask, img = queue.pop(0)
            server.submit(ids, mask, img)
        done.update(server.step())
    elapsed = time.perf_counter() - t0
    tokens = sum(len(v) for v in done.values())
    return elapsed, tokens


def main(args: Args) -> None:
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    from vla_fastvlm_tpu.device import enable_compilation_cache

    enable_compilation_cache()
    buckets = tuple(int(b) for b in args.buckets.split(","))
    _, _, server, jnp = _build(args, buckets)

    per_width = {}
    for width in buckets:
        per_width[width] = _prefill_burst(
            server,
            jnp,
            width,
            args.image_size,
            args.prefill_batch,
            args.chain,
            args.seed,
            text_only=args.text_only,
        )
    del server

    rng = np.random.default_rng(args.seed)
    reqs = _short_requests(
        args.num_requests, args.short_len, args.image_size, rng,
        text_only=args.text_only,
    )
    small = min(b for b in buckets if b >= args.short_len)
    bucketed_s, tokens = _run_load(args, (small, buckets[-1]), reqs)
    single_s, _ = _run_load(args, buckets[-1], reqs)

    print(
        json.dumps(
            {
                "prefill_ms_per_admission": {
                    str(w): round(t * 1e3, 2) for w, t in per_width.items()
                },
                "prefill_batch": args.prefill_batch,
                "text_only": args.text_only,
                "short_prompt_load": {
                    "num_requests": args.num_requests,
                    "short_len": args.short_len,
                    "tokens": tokens,
                    "bucketed_s": round(bucketed_s, 3),
                    "single_width_s": round(single_s, 3),
                    "speedup": round(single_s / bucketed_s, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main(parse_cli(Args))
