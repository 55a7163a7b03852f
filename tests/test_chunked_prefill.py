"""Chunked prefill exactness (models/fastvlm.py prefill_image_chunk /
prefill_text_chunk; serving/paged_kv.py prefill_chunk_tokens).

Anchor: chunked admission must be EXACT against the one-shot prefill — same
cache K/V rows, same validity mask, same cursor, same last-real-position
logits — and the chunked paged server must emit exactly the tokens the
unchunked server emits (greedy). The chunks run through the model's
cached-decode branch (slot causality + true-count RoPE, models/qwen2.py),
so these tests pin that branch's prefill semantics too.

No reference counterpart: the reference has no serving path at all
(its policy is one eager forward per env step, reference
``lerobot_fastvla/modeling_fastvla.py:113-125``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_fastvlm_tpu.models import FastVLM, fastvlm_tiny
from vla_fastvlm_tpu.models.qwen2 import init_kv_cache
from vla_fastvlm_tpu.serving.paged_kv import PagedGenerationServer


@pytest.fixture(scope="module")
def vlm():
    cfg = fastvlm_tiny()
    model = FastVLM(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    imgs = jnp.zeros((1, 3, 64, 64))
    params = model.init(jax.random.PRNGKey(0), imgs, ids)["params"]
    return cfg, model, params


@pytest.fixture(scope="module")
def text_vlm():
    cfg = fastvlm_tiny(image_token_mode="none")
    model = FastVLM(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), None, ids)["params"]
    return cfg, model, params


def _ragged_batch(rng, b, width):
    """Right-padded ragged prompts; every row has >= 2 real tokens."""
    ids = np.zeros((b, width), np.int32)
    mask = np.zeros((b, width), np.int32)
    for i in range(b):
        length = int(rng.integers(2, width + 1))
        ids[i, :length] = rng.integers(3, 100, length)
        mask[i, :length] = 1
    return jnp.asarray(ids), jnp.asarray(mask)


def _chunked_prefill(model, params, images, ids, mask, chunk, max_len):
    """Drive the chunk methods; returns (last_logits, cache)."""
    b, width = ids.shape
    assert width % chunk == 0
    cache = init_kv_cache(model.cfg.text, b, max_len)
    if images is not None and model.cfg.num_image_tokens > 0:
        cache = model.apply(
            {"params": params}, images, cache,
            method=FastVLM.prefill_image_chunk,
        )
    last = jnp.zeros((b, model.cfg.text.vocab_size), model.cfg.text.dtype)
    for j in range(width // chunk):
        sl = slice(j * chunk, (j + 1) * chunk)
        logits, cache = model.apply(
            {"params": params}, ids[:, sl], mask[:, sl], cache,
            method=FastVLM.prefill_text_chunk,
        )
        m = mask[:, sl]
        has = m.astype(bool).any(axis=1)
        idx = chunk - 1 - jnp.argmax(m[:, ::-1], axis=1)
        chunk_last = jnp.take_along_axis(logits, idx[:, None, None], axis=1)[:, 0]
        last = jnp.where(has[:, None], chunk_last, last)
    return last, cache


class TestModelChunks:
    def test_multimodal_chunks_match_one_shot(self, vlm):
        cfg, model, params = vlm
        rng = np.random.default_rng(0)
        b, width, chunk = 3, 12, 4
        ids, mask = _ragged_batch(rng, b, width)
        images = jnp.asarray(
            rng.random((b, 3, cfg.image_size, cfg.image_size), np.float32)
        )
        max_len = cfg.num_image_tokens + width + 8

        cache0 = init_kv_cache(cfg.text, b, max_len)
        ref_last, _, ref_cache, _, _ = model.apply(
            {"params": params}, images, ids, mask, cache0,
            method=FastVLM.prefill,
        )
        got_last, got_cache = _chunked_prefill(
            model, params, images, ids, mask, chunk, max_len
        )

        np.testing.assert_array_equal(
            np.asarray(got_cache["index"]), np.asarray(ref_cache["index"])
        )
        np.testing.assert_array_equal(
            np.asarray(got_cache["mask"]), np.asarray(ref_cache["mask"])
        )
        # K/V rows only compared where valid — pad slots hold garbage on
        # BOTH paths (different garbage: RoPE positions diverge there by
        # design; the mask keeps attention from ever reading them).
        valid = np.asarray(ref_cache["mask"])  # (B, S)
        for name in ("k", "v"):
            ref = np.asarray(ref_cache[name])  # (L, B, S, K, D)
            got = np.asarray(got_cache[name])
            sel = np.broadcast_to(
                valid[None, :, :, None, None], ref.shape
            )
            np.testing.assert_allclose(
                got[sel], ref[sel], rtol=2e-5, atol=2e-5
            )
        np.testing.assert_allclose(
            np.asarray(got_last), np.asarray(ref_last), rtol=2e-5, atol=2e-5
        )

    def test_text_only_chunks_match_one_shot(self, text_vlm):
        cfg, model, params = text_vlm
        rng = np.random.default_rng(1)
        b, width, chunk = 4, 16, 8
        ids, mask = _ragged_batch(rng, b, width)
        max_len = width + 8

        cache0 = init_kv_cache(cfg.text, b, max_len)
        ref_last, _, ref_cache, _, _ = model.apply(
            {"params": params}, None, ids, mask, cache0,
            method=FastVLM.prefill,
        )
        got_last, got_cache = _chunked_prefill(
            model, params, None, ids, mask, chunk, max_len
        )
        np.testing.assert_array_equal(
            np.asarray(got_cache["mask"]), np.asarray(ref_cache["mask"])
        )
        valid = np.asarray(ref_cache["mask"])
        for name in ("k", "v"):
            ref = np.asarray(ref_cache[name])
            got = np.asarray(got_cache[name])
            sel = np.broadcast_to(valid[None, :, :, None, None], ref.shape)
            np.testing.assert_allclose(
                got[sel], ref[sel], rtol=2e-5, atol=2e-5
            )
        np.testing.assert_allclose(
            np.asarray(got_last), np.asarray(ref_last), rtol=2e-5, atol=2e-5
        )

    def test_chunk_equals_full_width(self, text_vlm):
        """chunk == width reduces to one text chunk — still exact."""
        cfg, model, params = text_vlm
        rng = np.random.default_rng(2)
        ids, mask = _ragged_batch(rng, 2, 8)
        max_len = 16
        cache0 = init_kv_cache(cfg.text, 2, max_len)
        ref_last, _, _, _, _ = model.apply(
            {"params": params}, None, ids, mask, cache0,
            method=FastVLM.prefill,
        )
        got_last, _ = _chunked_prefill(
            model, params, None, ids, mask, 8, max_len
        )
        np.testing.assert_allclose(
            np.asarray(got_last), np.asarray(ref_last), rtol=2e-5, atol=2e-5
        )


def _requests(n, prompt_len, size, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        length = int(rng.integers(2, prompt_len + 1))
        ids = np.zeros((1, prompt_len), np.int32)
        mask = np.zeros((1, prompt_len), np.int32)
        ids[0, :length] = rng.integers(3, 100, length)
        mask[0, :length] = 1
        img = rng.random((1, 3, size, size), dtype=np.float32)
        out.append((ids, mask, img))
    return out


class TestChunkedServer:
    def _server(self, vlm, chunk, prefix_cache=0, **kw):
        cfg, model, params = vlm
        return PagedGenerationServer(
            model,
            params,
            num_slots=4,
            prompt_len=8,
            max_new_tokens=5,
            eos_token_id=-1,
            page_size=4,
            prefill_batch=2,
            prefill_chunk_tokens=chunk,
            prefix_cache_size=prefix_cache,
            **kw,
        )

    def test_chunked_matches_unchunked_staggered(self, vlm):
        """Greedy outputs identical, with arrivals landing mid-decode so
        chunked admission interleaves with decode ticks."""
        cfg, model, params = vlm
        reqs = _requests(6, 8, cfg.image_size)
        ref = self._server(vlm, chunk=0)
        got = self._server(vlm, chunk=4)
        out_ref, out_got = {}, {}
        for srv, out in ((ref, out_ref), (got, out_got)):
            it = iter(reqs)
            rids = [srv.submit(*next(it)) for _ in range(2)]
            pending = 4
            while srv.num_active or pending:
                if pending and srv.has_free_slot():
                    rids.append(srv.submit(*next(it)))
                    pending -= 1
                out.update(srv.step())
        assert len(out_ref) == len(out_got) == 6
        # rids are assigned in submit order on both servers.
        assert out_ref == out_got

    def test_chunked_text_only_server(self, text_vlm):
        reqs = [(r[0], r[1], None) for r in _requests(4, 8, 0, seed=3)]
        ref = self._server(text_vlm, chunk=0)
        got = self._server(text_vlm, chunk=2)
        for ids, mask, _ in reqs:
            ref.submit(ids, mask)
            got.submit(ids, mask)
        assert ref.run_to_completion() == got.run_to_completion()

    def test_flush_drains_inflight(self, vlm):
        cfg, model, params = vlm
        srv = self._server(vlm, chunk=4)
        req = _requests(1, 8, cfg.image_size, seed=4)[0]
        srv.submit(*req)
        srv.flush()  # must run image chunk + both text chunks + finalize
        assert srv._inflight is None
        assert sum(s.active for s in srv._slots) == 1

    def test_chunked_with_prefix_cache(self, vlm):
        """Hits admit instantly even while a miss batch is mid-chunk; output
        tokens match the plain unchunked server (greedy)."""
        cfg, model, params = vlm
        base = _requests(2, 8, cfg.image_size, seed=5)
        # schedule: A, B, A(hit), B(hit)
        schedule = [base[0], base[1], base[0], base[1]]
        ref = self._server(vlm, chunk=0)
        for r in schedule:
            ref.submit(*r)
        expected = ref.run_to_completion()

        srv = self._server(vlm, chunk=4, prefix_cache=4)
        rids = [srv.submit(*schedule[0]), srv.submit(*schedule[1])]
        # Admit the first batch fully, then submit the repeats mid-decode.
        srv.step()
        rids.append(srv.submit(*schedule[2]))
        rids.append(srv.submit(*schedule[3]))
        got = srv.run_to_completion()
        assert srv.prefix_cache_hits == 2
        assert srv.prefix_cache_misses == 2
        assert got == expected

    def test_bucket_divisibility_validated(self, vlm):
        cfg, model, params = vlm
        with pytest.raises(ValueError, match="multiples"):
            PagedGenerationServer(
                model, params, num_slots=2, prompt_len=10,
                max_new_tokens=2, page_size=2, prefill_chunk_tokens=4,
            )

    def test_pool_accounting_balances(self, vlm):
        """All pages return to the free list after a chunked run."""
        cfg, model, params = vlm
        srv = self._server(vlm, chunk=4)
        free0 = srv.pool.free_pages
        queue = _requests(5, 8, cfg.image_size, seed=6)
        while queue or srv.num_active:
            while queue and srv.has_free_slot():
                srv.submit(*queue.pop())
            srv.step()
        assert srv.pool.free_pages == free0
        assert srv.pool._refcount[1:].sum() == 0
