#!/usr/bin/env python
"""Speculative decoding bench: big target + small draft on ONE v5e chip.

The deployment question (``serving/speculative.py``): decode on a
weight-streaming-bound target (Qwen2-7B int8/int4, BASELINE.md) pays one
full weight stream per token; a 0.5B draft proposes ``k`` tokens and one
target ``verify_step`` over the (k+1)-token window prices them all. Whether
that wins hinges on TWO measured facts plus one workload property:

- **measured here**: ``t_verify(k+1) / t_target`` — in the weight-bound
  regime the verify forward costs about the same as a single decode step
  (same weight stream, k+1 instead of 1 MXU rows), so the premise holds;
  and ``t_draft``, the per-step draft cost riding along.
- **workload-dependent**: the per-token draft acceptance rate ``alpha``
  (how often the 0.5B's greedy token matches the 7B's). That needs real
  checkpoints + real prompts (env-blocked: zero egress), so this bench
  reports the measured cost model as a function of alpha — projected
  tokens/sec, speedup, and the break-even alpha — instead of pretending
  fabricated-weight agreement (~chance) means anything.

All component timings chain DEPTH data-dependent steps in ONE program with
a single tiny fetch (the tunnel's ~30 ms RTT amortizes to <2 ms/step; see
CLAUDE.md on ``block_until_ready``); each step rewinds the cache cursor so
state is fixed across the chain. The real ``SpeculativeGenerator`` loop
also runs end to end (fabricated weights => worst-case alpha ~= 0) as a
correctness/overhead anchor.

The draft's vocab is padded to the target's (152064 vs 151936 for real
Qwen2-0.5B/7B — same tokenizer, the 7B checkpoint just pads the embedding;
fabricated here either way).

No reference counterpart: the reference never generates text
(``/root/reference/src/vla_fastvlm/fastvlm_adapter.py`` pools hidden
states only).

Usage:
    python scripts/bench_speculative.py                 # 7B int8 + 0.5B, k=4
    python scripts/bench_speculative.py --quantization int4 --k 6
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
    target_size: str = "7b"  # "0.5b" | "1.5b" | "7b"
    draft_size: str = "0.5b"
    quantization: str = "int8"  # target-side: "int8" | "int4" | "none"
    k: int = 4  # draft lookahead per round
    batch_size: int = 8
    prompt_len: int = 48
    max_new_tokens: int = 32  # for the real-loop anchor
    depth: int = 16  # chained steps per timed program
    iters: int = 5
    device: str | None = None
    seed: int = 0
    # Also measure the CONTINUOUS-BATCHING integration: p50 step() of
    # SpeculativeGenerationServer (draft-verify tick across all slots) vs
    # the plain GenerationServer on the same target — the per-tick price of
    # host routing + one un-amortized dispatch round-trip per round.
    server: bool = False
    num_slots: int = 8
    prefill_batch: int = 4
    # With --server: also run the PAGED pair (SpeculativePagedGenerationServer
    # vs plain PagedGenerationServer) at this page size. 0 = dense only.
    paged_page_size: int = 0


def _preset(size: str):
    from vla_fastvlm_tpu.models.fastvlm import (
        fastvlm_0_5b,
        fastvlm_1_5b,
        fastvlm_7b,
        fastvlm_tiny,
    )

    return {
        "tiny": fastvlm_tiny,  # CPU smoke only
        "0.5b": fastvlm_0_5b,
        "1.5b": fastvlm_1_5b,
        "7b": fastvlm_7b,
    }[size]


def _build(size: str, *, quantization: str, vocab_size: int | None, seed: int):
    """Text-only FastVLM at fabricated exact shapes, placed on device."""
    import jax
    import jax.numpy as jnp

    from vla_fastvlm_tpu.device import place_params
    from vla_fastvlm_tpu.io.fabricate import fabricate_like
    from vla_fastvlm_tpu.io.quantize import quantize_params
    from vla_fastvlm_tpu.models.fastvlm import FastVLM

    cfg = _preset(size)(image_token_mode="none")
    text_over = {
        "quantization": quantization,
        "dtype": jnp.bfloat16,
        "param_dtype": jnp.bfloat16,
    }
    if vocab_size is not None:
        text_over["vocab_size"] = vocab_size
    cfg = cfg.replace(text=cfg.text.replace(**text_over))
    model = FastVLM(cfg)

    float_cfg = cfg.replace(text=cfg.text.replace(quantization="none"))
    # Init through ``prefill`` (not ``__call__``): plain __call__ returns
    # hidden states only and never materializes the untied lm_head params,
    # so a 7b tree fabricated from its shapes would KeyError at the first
    # verify/prefill logits computation.
    from vla_fastvlm_tpu.serving.generate import build_cache

    init_cache = build_cache(float_cfg, 1, 4, 2)
    shapes = jax.eval_shape(
        lambda: FastVLM(float_cfg).init(
            jax.random.PRNGKey(0),
            None,
            jnp.ones((1, 4), jnp.int32),
            jnp.ones((1, 4), jnp.int32),
            init_cache,
            method=FastVLM.prefill,
        )["params"]
    )
    params = fabricate_like(shapes, seed=seed)
    if quantization != "none":
        params = quantize_params(params, mode=quantization)
    bytes_ = sum(
        leaf.nbytes // 2 if leaf.dtype == jnp.int4 else leaf.nbytes
        for leaf in jax.tree_util.tree_leaves(params)
    )
    params = place_params(params, jax.devices()[0])
    jax.block_until_ready(params)
    return cfg, model, params, bytes_


def _bench_server(args: Args, target, tparams, draft, dparams) -> dict:
    """p50 step() of the speculative server vs the plain server, all slots
    occupied (text-only synthetic prompts, fabricated weights => the draft
    acceptance is ~chance, so ``spec_tokens_per_tick`` here is the WORST
    case; real-checkpoint pairs multiply it by their measured alpha curve —
    the projected table above)."""
    import time as _time

    from vla_fastvlm_tpu.serving import (
        GenerationServer,
        SpeculativeGenerationServer,
    )

    rng = np.random.default_rng(args.seed + 2)
    new = args.max_new_tokens

    def requests(n):
        out = []
        for _ in range(n):
            ids = rng.integers(3, 1000, (1, args.prompt_len)).astype(np.int32)
            mask = np.ones((1, args.prompt_len), np.int32)
            out.append((ids, mask))
        return out

    def drive(server, label):
        collected = {}
        for ids, mask in requests(args.num_slots):
            server.submit(ids, mask)
        server.flush()  # admissions (and their compiles) off the tick clock
        collected.update(server.step())  # compile the tick program
        before = sum(len(s.tokens) for s in server._slots if s.active)
        before += sum(len(t) for t in collected.values())
        tick_times = []
        while server.num_active:
            t0 = _time.perf_counter()
            collected.update(server.step())
            tick_times.append(_time.perf_counter() - t0)
        emitted = sum(len(t) for t in collected.values()) - before
        if not tick_times:
            raise RuntimeError(
                "server drained inside the warm-up step — raise "
                "--max-new-tokens above k+2 so timed ticks exist"
            )
        p50 = sorted(tick_times)[len(tick_times) // 2]
        print(
            f"[spec-bench] {label}: p50 tick {p50 * 1e3:.2f} ms over "
            f"{len(tick_times)} ticks ({emitted} timed-tick tokens)",
            file=sys.stderr,
        )
        return p50, emitted / max(len(tick_times), 1)

    spec = SpeculativeGenerationServer(
        target, tparams, draft, dparams, k=args.k,
        num_slots=args.num_slots, prompt_len=args.prompt_len,
        max_new_tokens=new, eos_token_id=-1,
        prefill_batch=args.prefill_batch,
    )
    spec_p50, spec_tpt = drive(spec, "speculative server")
    plain = GenerationServer(
        target, tparams, num_slots=args.num_slots,
        prompt_len=args.prompt_len, max_new_tokens=new,
        eos_token_id=-1, prefill_batch=args.prefill_batch,
    )
    plain_p50, _ = drive(plain, "plain server")
    out = {
        "server_spec_p50_tick_ms": round(spec_p50 * 1e3, 2),
        "server_plain_p50_tick_ms": round(plain_p50 * 1e3, 2),
        # tokens per spec tick at fabricated-weight (worst-case) acceptance
        "server_spec_tokens_per_tick_worstcase": round(spec_tpt, 2),
        # tick-time ratio: what a round costs vs one plain decode tick —
        # with the alpha curve above this prices the server end to end
        "server_round_over_tick": round(spec_p50 / plain_p50, 2),
    }
    if args.paged_page_size > 0:
        from vla_fastvlm_tpu.serving import (
            PagedGenerationServer,
            SpeculativePagedGenerationServer,
        )

        spec_paged = SpeculativePagedGenerationServer(
            target, tparams, draft, dparams, k=args.k,
            num_slots=args.num_slots, prompt_len=args.prompt_len,
            max_new_tokens=new, eos_token_id=-1,
            prefill_batch=args.prefill_batch,
            page_size=args.paged_page_size,
        )
        sp_p50, sp_tpt = drive(spec_paged, "speculative PAGED server")
        plain_paged = PagedGenerationServer(
            target, tparams, num_slots=args.num_slots,
            prompt_len=args.prompt_len, max_new_tokens=new,
            eos_token_id=-1, prefill_batch=args.prefill_batch,
            page_size=args.paged_page_size,
        )
        pp_p50, _ = drive(plain_paged, "plain PAGED server")
        out.update(
            server_spec_paged_p50_tick_ms=round(sp_p50 * 1e3, 2),
            server_plain_paged_p50_tick_ms=round(pp_p50 * 1e3, 2),
            server_spec_paged_tokens_per_tick_worstcase=round(sp_tpt, 2),
            server_paged_round_over_tick=round(sp_p50 / pp_p50, 2),
        )
    return out


def main(args: Args) -> None:
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    import jax
    import jax.numpy as jnp

    from vla_fastvlm_tpu.device import enable_compilation_cache

    enable_compilation_cache()

    from vla_fastvlm_tpu.models.fastvlm import FastVLM
    from vla_fastvlm_tpu.serving import SpeculativeGenerator
    from vla_fastvlm_tpu.serving.generate import build_cache
    from vla_fastvlm_tpu.serving.speculative import _rollback

    k, b, t = args.k, args.batch_size, args.prompt_len
    print(
        f"[spec-bench] target={args.target_size}({args.quantization}) "
        f"draft={args.draft_size}(bf16) k={k} batch={b}",
        file=sys.stderr,
    )
    tcfg, target, tparams, tbytes = _build(
        args.target_size, quantization=args.quantization, vocab_size=None,
        seed=args.seed,
    )
    dcfg, draft, dparams, dbytes = _build(
        args.draft_size, quantization="none",
        vocab_size=tcfg.text.vocab_size, seed=args.seed + 1,
    )
    print(
        f"[spec-bench] on-device weights: target {tbytes / 1e9:.2f} GB + "
        f"draft {dbytes / 1e9:.2f} GB",
        file=sys.stderr,
    )

    rng = np.random.default_rng(args.seed)
    ids = jnp.asarray(rng.integers(3, 1000, (b, t)), jnp.int32)
    mask = jnp.ones((b, t), jnp.int32)

    def prefill(model, params, cfg):
        cache = build_cache(cfg, b, t, args.max_new_tokens + k + 1)
        fn = jax.jit(
            lambda p, c, i, m: model.apply(
                {"params": p}, None, i, m, c, method=FastVLM.prefill
            )
        )
        logits, _, cache, _, _ = fn(params, cache, ids, mask)
        return logits.argmax(-1).astype(jnp.int32), cache

    token_t, cache_t = prefill(target, tparams, tcfg)
    _, cache_d = prefill(draft, dparams, dcfg)
    jax.block_until_ready((token_t, cache_t, cache_d))

    # --- chained single-program timers; cursor rewinds keep state fixed.
    def decode_chain(model):
        @jax.jit
        def run(params, token, cache):
            def step(carry, _):
                tok, c = carry
                logits, c = model.apply(
                    {"params": params}, tok[:, None], c,
                    method=FastVLM.decode_step,
                )
                c = _rollback(c, c["index"] - 1)
                return (logits.argmax(-1).astype(jnp.int32), c), ()

            (tok, _), _ = jax.lax.scan(
                step, (token, cache), None, length=args.depth
            )
            return tok

        return run

    @jax.jit
    def verify_chain(params, token, cache):
        def step(carry, _):
            win, c = carry
            logits, c = target.apply(
                {"params": params}, win, c, method=FastVLM.verify_step
            )
            c = _rollback(c, c["index"] - (k + 1))
            return (logits.argmax(-1).astype(jnp.int32), c), ()

        window0 = jnp.tile(token[:, None], (1, k + 1))
        (win, _), _ = jax.lax.scan(
            step, (window0, cache), None, length=args.depth
        )
        return win[:, 0]

    def timeit(label, fn, *argsets):
        t0 = time.perf_counter()
        np.asarray(fn(*argsets))
        print(
            f"[spec-bench] {label} compile+first {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(fn(*argsets))
            times.append(time.perf_counter() - t0)
        p50 = sorted(times)[len(times) // 2]
        return p50 / args.depth  # chained: per-step seconds, RTT amortized

    t_target = timeit(
        "target decode", decode_chain(target), tparams, token_t, cache_t
    )
    t_verify = timeit("target verify", verify_chain, tparams, token_t, cache_t)
    t_draft = timeit(
        "draft decode", decode_chain(draft), dparams, token_t, cache_d
    )
    print(
        f"[spec-bench] t_target {t_target * 1e3:.2f} ms, "
        f"t_verify(k+1={k + 1}) {t_verify * 1e3:.2f} ms "
        f"({t_verify / t_target:.2f}x a decode step), "
        f"t_draft {t_draft * 1e3:.2f} ms",
        file=sys.stderr,
    )

    # --- acceptance -> throughput model from the measured costs.
    round_cost = (k + 1) * t_draft + t_verify
    plain_tps = b / t_target

    def tokens_per_round(alpha):  # E[leading matches] + 1 correction token
        return sum(alpha ** i for i in range(k + 1))

    def spec_tps(alpha):
        return b * tokens_per_round(alpha) / round_cost

    lo, hi = 0.0, 1.0
    for _ in range(60):  # bisect break-even alpha (monotone in alpha)
        mid = (lo + hi) / 2
        lo, hi = (mid, hi) if spec_tps(mid) < plain_tps else (lo, mid)
    breakeven = (lo + hi) / 2
    grid = {
        f"{a:.1f}": round(spec_tps(a) / plain_tps, 2)
        for a in (0.5, 0.7, 0.8, 0.9, 1.0)
    }
    print(
        f"[spec-bench] round cost {round_cost * 1e3:.2f} ms; break-even "
        f"alpha {breakeven:.2f}; speedup@alpha {grid}",
        file=sys.stderr,
    )

    # --- real-loop anchor (fabricated weights: alpha ~= chance, worst case).
    gen = SpeculativeGenerator(
        target, tparams, draft, dparams, k=k, eos_token_id=-1
    )
    out = gen.generate(None, ids, mask, max_new_tokens=args.max_new_tokens)
    t0 = time.perf_counter()
    out = gen.generate(None, ids, mask, max_new_tokens=args.max_new_tokens)
    loop_s = time.perf_counter() - t0
    assert out.shape == (b, args.max_new_tokens)
    loop_tps = b * args.max_new_tokens / loop_s
    print(
        f"[spec-bench] real loop (worst-case alpha) {loop_tps:.0f} tok/s "
        f"vs plain {plain_tps:.0f} (host round-trips per round included)",
        file=sys.stderr,
    )

    server_stats = {}
    if args.server:
        server_stats = _bench_server(args, target, tparams, draft, dparams)

    print(
        json.dumps(
            {
                **server_stats,
                "metric": (
                    f"speculative {args.target_size}-{args.quantization}"
                    f"+{args.draft_size} k={k} projected tokens/sec/chip"
                    " @ alpha=0.8"
                ),
                "value": round(spec_tps(0.8), 1),
                "unit": "tokens/sec/chip",
                "plain_tokens_per_sec": round(plain_tps, 1),
                "t_target_ms": round(t_target * 1e3, 2),
                "t_verify_ms": round(t_verify * 1e3, 2),
                "t_draft_ms": round(t_draft * 1e3, 2),
                "verify_over_decode": round(t_verify / t_target, 2),
                "breakeven_alpha": round(breakeven, 2),
                "speedup_at_alpha": grid,
                "worstcase_loop_tokens_per_sec": round(loop_tps, 1),
            }
        )
    )


if __name__ == "__main__":
    main(parse_cli(Args, prog="bench_speculative.py"))
