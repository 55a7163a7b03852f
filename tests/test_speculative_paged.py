"""Speculative x paged serving (serving/speculative_paged.py).

The composition contract: the speculative paged server must emit exactly
what the plain paged server (and therefore the target's own offline greedy
``generate``) emits, request for request — the draft + page-pool window
writes + host-side rollback only change how many target forwards (and
which pool rows) produce them. Random-weight tiny models keep draft/target
agreement near chance, exercising every acceptance count.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_fastvlm_tpu.models import FastVLM, fastvlm_tiny
from vla_fastvlm_tpu.serving import (
    PagedGenerationServer,
    SpeculativePagedGenerationServer,
)


def _model(seed, **overrides):
    cfg = fastvlm_tiny()
    if overrides:
        cfg = cfg.replace(text=cfg.text.replace(**overrides))
    model = FastVLM(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    imgs = jnp.zeros((1, 3, cfg.image_size, cfg.image_size))
    params = model.init(jax.random.PRNGKey(seed), imgs, ids)["params"]
    return cfg, model, params


@pytest.fixture(scope="module")
def pair():
    cfg, target, tparams = _model(0)
    _, draft, dparams = _model(7)
    return cfg, target, tparams, draft, dparams


PROMPT_LEN = 8
MAX_NEW = 6
EOS = 2


def _requests(cfg, n, seed=0, repeat_every=0):
    rng = np.random.default_rng(seed)
    out = []
    shared = None
    for i in range(n):
        if repeat_every and shared is not None and i % repeat_every == 0:
            out.append(shared)
            continue
        length = int(rng.integers(3, PROMPT_LEN + 1))
        ids = np.zeros((1, PROMPT_LEN), np.int32)
        mask = np.zeros((1, PROMPT_LEN), np.int32)
        ids[0, :length] = rng.integers(3, 200, length)
        mask[0, :length] = 1
        imgs = rng.random((1, 3, cfg.image_size, cfg.image_size), np.float32)
        out.append((ids, mask, imgs))
        if shared is None:
            shared = out[-1]
    return out


def _drain(server, reqs, max_ticks=200):
    """Submit as slots free up; returns outputs in request order."""
    queue = list(reqs)
    rids, outputs = [], {}
    for _ in range(max_ticks):
        while queue and server.has_free_slot():
            ids, mask, imgs = queue.pop(0)
            rids.append(server.submit(ids, mask, imgs))
        outputs.update(server.step())
        if not queue and not server.num_active:
            break
    assert len(outputs) == len(reqs), "server did not drain"
    return [outputs[r] for r in rids]


def _spec(target, tparams, draft, dparams, k=2, slots=3, **kw):
    kw.setdefault("num_slots", slots)
    kw.setdefault("prompt_len", PROMPT_LEN)
    kw.setdefault("max_new_tokens", MAX_NEW)
    kw.setdefault("eos_token_id", EOS)
    kw.setdefault("prefill_batch", 2)
    kw.setdefault("page_size", 4)
    return SpeculativePagedGenerationServer(
        target, tparams, draft, dparams, k=k, **kw
    )


def _plain(target, tparams, slots=3, **kw):
    kw.setdefault("num_slots", slots)
    kw.setdefault("prompt_len", PROMPT_LEN)
    kw.setdefault("max_new_tokens", MAX_NEW)
    kw.setdefault("eos_token_id", EOS)
    kw.setdefault("prefill_batch", 2)
    kw.setdefault("page_size", 4)
    return PagedGenerationServer(target, tparams, **kw)


class TestSpeculativePagedExactness:
    @pytest.mark.parametrize("k", [1, 3])
    def test_matches_plain_paged_server(self, pair, k):
        cfg, target, tparams, draft, dparams = pair
        reqs = _requests(cfg, 5, seed=11)
        ref = _drain(_plain(target, tparams), reqs)
        got = _drain(_spec(target, tparams, draft, dparams, k=k), reqs)
        for i, (a, b) in enumerate(zip(ref, got)):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"request {i}: plain paged vs speculative paged (k={k})",
            )

    def test_self_draft_fewer_ticks(self, pair):
        """draft == target: full acceptance drains in ~1/(k+1) the ticks
        and the pool pages recycle (no leak from the window writes)."""
        cfg, target, tparams, _, _ = pair
        k = 2
        server = _spec(target, tparams, target, tparams, k=k, slots=2)
        reqs = _requests(cfg, 1, seed=3)
        out = _drain(server, reqs, max_ticks=50)
        ref = _drain(_plain(target, tparams, slots=2), reqs)
        np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))
        emitted_after_first = len(out[0]) - 1
        expected = -(-emitted_after_first // (k + 1)) if emitted_after_first else 0
        assert server.spec_ticks <= max(expected, 1)
        # all pages returned to the free list once drained
        assert server.pool.free_pages == server.pool.num_pages - 1

    def test_oversubscribed_slot_reuse(self, pair):
        cfg, target, tparams, draft, dparams = pair
        reqs = _requests(cfg, 7, seed=8)
        ref = _drain(_plain(target, tparams, slots=2), reqs)
        got = _drain(_spec(target, tparams, draft, dparams, k=3, slots=2), reqs)
        for i, (a, b) in enumerate(zip(ref, got)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_int8_kv_pools(self):
        """int8 page pools through verify_step_paged: scales scatter with
        the window rows; exact vs the plain paged server on the same int8
        configuration."""
        cfg, target, tparams = _model(0, kv_cache_quantization="int8")
        _, draft, dparams = _model(7)
        reqs = _requests(cfg, 4, seed=19)
        ref = _drain(_plain(target, tparams), reqs)
        got = _drain(_spec(target, tparams, draft, dparams, k=2), reqs)
        for i, (a, b) in enumerate(zip(ref, got)):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"request {i}: int8-KV plain vs speculative paged",
            )

    def test_prefix_cache_composition(self, pair):
        """Repeated prompts hit the prefix cache (target prefill skipped,
        draft still prefilled) and outputs stay exact vs the cache-off
        speculative server AND the plain paged server."""
        cfg, target, tparams, draft, dparams = pair
        reqs = _requests(cfg, 6, seed=23, repeat_every=2)
        ref = _drain(_plain(target, tparams), reqs)
        cached = _spec(
            target, tparams, draft, dparams, k=2, prefix_cache_size=4
        )
        got = _drain(cached, reqs)
        assert cached.prefix_cache_hits >= 2
        for i, (a, b) in enumerate(zip(ref, got)):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"request {i}: prefix-cached speculative paged",
            )

    def test_chunked_prefill_composition(self, pair):
        """Chunk-paced target admission + whole draft prefill at finalize:
        token-exact vs the unchunked speculative paged server."""
        cfg, target, tparams, draft, dparams = pair
        reqs = _requests(cfg, 4, seed=29)
        ref = _drain(_spec(target, tparams, draft, dparams, k=2), reqs)
        got = _drain(
            _spec(
                target, tparams, draft, dparams, k=2,
                prefill_chunk_tokens=4,
            ),
            reqs,
        )
        for i, (a, b) in enumerate(zip(ref, got)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_sampling_smoke(self, pair):
        """temperature > 0 runs the rejection-sampling round against the
        pool; budget and vocab bounds hold (distribution pinned at the
        generator level in test_speculative.py — same primitives)."""
        cfg, target, tparams, draft, dparams = pair
        server = _spec(
            target, tparams, draft, dparams, k=2,
            temperature=0.9, top_p=0.95, seed=7,
        )
        outs = _drain(server, _requests(cfg, 4, seed=31), max_ticks=80)
        for toks in outs:
            assert 1 <= len(toks) <= MAX_NEW
            assert all(0 <= t < cfg.text.vocab_size for t in toks)

    def test_vocab_mismatch_rejected(self, pair):
        cfg, target, tparams, _, _ = pair
        _, draft2, dparams2 = _model(3, vocab_size=cfg.text.vocab_size + 8)
        with pytest.raises(ValueError, match="vocab"):
            _spec(target, tparams, draft2, dparams2)
