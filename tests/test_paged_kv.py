"""Paged KV cache serving (serving/paged_kv.py).

Exactness anchor: paged continuous batching must emit exactly the tokens
sequential whole-batch generation emits (same anchor as the dense
``GenerationServer`` tests). Plus the paging-specific behaviors: page reuse
after a slot finishes (an oversubscribed pool serves more requests than
concurrent max-length slots could), allocation exhaustion, and trash-page
isolation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_fastvlm_tpu.models import FastVLM, fastvlm_tiny
from vla_fastvlm_tpu.models.qwen2 import qwen2_tiny
from vla_fastvlm_tpu.serving import generate
from vla_fastvlm_tpu.serving.paged_kv import PagedGenerationServer, PagedKVPool


@pytest.fixture(scope="module")
def vlm():
    cfg = fastvlm_tiny()
    model = FastVLM(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    imgs = jnp.zeros((1, 3, 64, 64))
    params = model.init(jax.random.PRNGKey(0), imgs, ids)["params"]
    return cfg, model, params


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


class TestPool:
    def test_allocate_free_roundtrip(self):
        pool = PagedKVPool(qwen2_tiny(), num_pages=9, page_size=4,
                           num_slots=2, max_len=16)
        assert pool.free_pages == 8
        pool.allocate(0, 9)  # 3 pages
        assert pool.free_pages == 5
        assert np.count_nonzero(pool.page_table[0]) == 3
        pool.allocate(0, 10)  # still 3 pages
        assert pool.free_pages == 5
        pool.allocate(0, 13)  # grows to 4
        assert pool.free_pages == 4
        pool.free(0)
        assert pool.free_pages == 8
        assert np.count_nonzero(pool.page_table[0]) == 0

    def test_pool_exhaustion(self):
        pool = PagedKVPool(qwen2_tiny(), num_pages=3, page_size=4,
                           num_slots=2, max_len=16)
        pool.allocate(0, 8)  # uses both free pages
        with pytest.raises(RuntimeError, match="exhausted"):
            pool.allocate(1, 4)

    def test_max_len_page_multiple(self):
        with pytest.raises(ValueError, match="multiple"):
            PagedKVPool(qwen2_tiny(), num_pages=4, page_size=5,
                        num_slots=1, max_len=16)


class TestPagedServer:
    def test_matches_sequential_generation(self, vlm):
        """Interleaved paged serving == whole-batch sequential generate."""
        cfg, model, params = vlm
        prompt_len, new = 8, 6
        reqs = _requests(5, prompt_len, cfg.image_size)

        server = PagedGenerationServer(
            model, params, num_slots=3, prompt_len=prompt_len,
            max_new_tokens=new, eos_token_id=-1, page_size=4,
        )
        rids = {}
        outputs = {}
        it = iter(reqs)
        pending = next(it, None)
        while pending is not None or server.num_active:
            while pending is not None and server.has_free_slot():
                ids, mask, img = pending
                rids[server.submit(ids, mask, img)] = (ids, mask, img)
                pending = next(it, None)
            outputs.update(server.step())
        outputs.update(server.step())
        assert len(outputs) == len(reqs)

        # Reference: batched generate over all requests at once.
        ids = jnp.asarray(np.concatenate([r[0] for r in reqs]))
        mask = jnp.asarray(np.concatenate([r[1] for r in reqs]))
        imgs = jnp.asarray(np.concatenate([r[2] for r in reqs]))
        ref = np.asarray(
            generate(model, params, imgs, ids, mask,
                     max_new_tokens=new, eos_token_id=-1)
        )
        for rid in sorted(rids):
            np.testing.assert_array_equal(
                np.asarray(outputs[rid]), ref[rid], err_msg=f"request {rid}"
            )

    def test_page_reuse_oversubscribed_pool(self, vlm):
        """A pool sized for ~1.5 concurrent max-length slots serves 4
        sequential requests via page recycling."""
        cfg, model, params = vlm
        prompt_len, new = 8, 4
        logical = cfg.num_image_tokens + prompt_len + new  # 28 -> 7 pages
        pages_per_req = -(-logical // 4)
        server = PagedGenerationServer(
            model, params, num_slots=2, prompt_len=prompt_len,
            max_new_tokens=new, eos_token_id=-1, page_size=4,
            num_pages=pages_per_req + 3,
        )
        reqs = _requests(4, prompt_len, cfg.image_size, seed=1)
        outputs = {}
        for ids, mask, img in reqs:
            server.submit(ids, mask, img)
            outputs.update(server.run_to_completion())
        assert len(outputs) == 4
        for tokens in outputs.values():
            assert len(tokens) == new

    def test_concurrent_oversubscription_defers_not_wedges(self, vlm):
        """Regression (review finding): a pool too small for two concurrent
        max-length decodes must DEFER the second admission (has_free_slot
        false / reserve raises), never raise mid-step and wedge."""
        cfg, model, params = vlm
        prompt_len, new = 8, 4
        logical = cfg.num_image_tokens + prompt_len + new
        pages_per_req = -(-logical // 4)
        server = PagedGenerationServer(
            model, params, num_slots=2, prompt_len=prompt_len,
            max_new_tokens=new, eos_token_id=-1, page_size=4,
            num_pages=pages_per_req + 2,  # < 2 concurrent worst cases
        )
        reqs = _requests(2, prompt_len, cfg.image_size, seed=7)
        outputs = {}
        server.submit(*reqs[0])
        # Slot 1 is physically free but the pool cannot cover a second
        # worst case -> admission must be refused, not wedged.
        assert not server.has_free_slot()
        with pytest.raises(RuntimeError, match="cannot admit"):
            server.submit(*reqs[1])
        # Draining the first request frees its pages; then the second runs.
        while not server.has_free_slot():
            outputs.update(server.step())
        server.submit(*reqs[1])
        outputs.update(server.run_to_completion())
        assert len(outputs) == 2
        for tokens in outputs.values():
            assert len(tokens) == new

    def test_tp_mesh_matches_single_device(self, vlm):
        """Paged serving on a 2-way TP mesh == unsharded paged serving."""
        from vla_fastvlm_tpu.parallel import make_mesh

        cfg, model, params = vlm
        prompt_len, new = 8, 4
        reqs = _requests(3, prompt_len, cfg.image_size, seed=3)

        def run(mesh):
            server = PagedGenerationServer(
                model, params, num_slots=2, prompt_len=prompt_len,
                max_new_tokens=new, eos_token_id=-1, page_size=4, mesh=mesh,
            )
            outputs = {}
            for ids, mask, img in reqs:
                while not server.has_free_slot():
                    outputs.update(server.step())
                server.submit(ids, mask, img)
            outputs.update(server.run_to_completion())
            return outputs

        ref = run(None)
        mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
        got = run(mesh)
        assert sorted(ref) == sorted(got)
        for rid in ref:
            np.testing.assert_array_equal(
                np.asarray(got[rid]), np.asarray(ref[rid]), err_msg=f"req {rid}"
            )

    def test_eos_frees_slot_early(self, vlm):
        cfg, model, params = vlm
        prompt_len = 8
        server = PagedGenerationServer(
            model, params, num_slots=1, prompt_len=prompt_len,
            max_new_tokens=8, page_size=4,
        )
        ids, mask, img = _requests(1, prompt_len, cfg.image_size, seed=2)[0]
        # Force the first emitted token to be EOS by making eos huge... not
        # controllable with random weights; instead check bookkeeping: free
        # pages return when remaining hits 0.
        before = server.pool.free_pages
        server.submit(ids, mask, img)
        server.flush()  # admission allocates the prompt pages
        assert server.pool.free_pages < before
        server.run_to_completion()
        assert server.pool.free_pages == before
        assert server.num_active == 0


class TestPrefixCache:
    """Automatic prefix caching (vLLM-style page sharing, round 3).

    A repeated (prompt, image) pair skips the prefill program: full prompt
    pages are installed by reference, the decode-written tail page is copied
    privately (copy-on-write), and the first token samples from the cached
    last-position logits. Greedy outputs must be token-exact vs the uncached
    server; page refcounts must balance through finish/eviction.
    """

    @pytest.mark.parametrize("page_size", [4, 16])
    def test_hits_token_exact_vs_uncached(self, vlm, page_size):
        # page_size=4: prefill (16 img + 8 text = 24) is page-aligned;
        # page_size=16: partial tail page -> copy-on-write path.
        cfg, model, params = vlm
        prompt_len, new = 8, 6
        base = _requests(2, prompt_len, cfg.image_size, seed=3)
        # duplicates of request 0 interleaved with a distinct request
        reqs = [base[0], base[1], base[0], base[0]]

        def run(cache_size):
            server = PagedGenerationServer(
                model, params, num_slots=2, prompt_len=prompt_len,
                max_new_tokens=new, eos_token_id=-1, page_size=page_size,
                prefix_cache_size=cache_size,
            )
            outputs = {}
            for ids, mask, img in reqs:
                while not server.has_free_slot():
                    outputs.update(server.step())
                server.submit(ids, mask, img)
            outputs.update(server.run_to_completion())
            return server, outputs

        _, ref = run(0)
        server, got = run(4)
        assert server.prefix_cache_hits == 2
        assert server.prefix_cache_misses == 2
        assert sorted(ref) == sorted(got)
        for rid in ref:
            np.testing.assert_array_equal(
                np.asarray(got[rid]), np.asarray(ref[rid]), err_msg=f"req {rid}"
            )

    def test_hit_skips_prefill_program(self, vlm):
        cfg, model, params = vlm
        prompt_len, new = 8, 3
        server = PagedGenerationServer(
            model, params, num_slots=2, prompt_len=prompt_len,
            max_new_tokens=new, eos_token_id=-1, page_size=4,
            prefix_cache_size=2,
        )
        calls = []
        inner = server._prefill
        server._prefill = lambda *a, **k: (calls.append(1), inner(*a, **k))[1]
        req = _requests(1, prompt_len, cfg.image_size, seed=5)[0]
        server.submit(*req)
        server.run_to_completion()
        assert len(calls) == 1
        server.submit(*req)  # identical -> cache hit
        out = server.run_to_completion()
        assert len(calls) == 1  # prefill never re-ran
        assert len(next(iter(out.values()))) == new

    def test_concurrent_sharing_uses_fewer_pages(self, vlm):
        """Two concurrent slots on the same prompt share its full pages."""
        cfg, model, params = vlm
        prompt_len, new = 8, 6
        page_size = 4
        req = _requests(1, prompt_len, cfg.image_size, seed=6)[0]
        prefill_len = cfg.num_image_tokens + prompt_len  # 24 -> 6 pages

        def used_pages(server):
            return (server.pool.num_pages - 1) - server.pool.free_pages

        def run(cache_size):
            server = PagedGenerationServer(
                model, params, num_slots=2, prompt_len=prompt_len,
                max_new_tokens=new, eos_token_id=-1, page_size=page_size,
                prefix_cache_size=cache_size, prefill_batch=1,
            )
            server.submit(*req)
            server.submit(*req)
            server.flush()
            return server

        uncached = run(0)
        cached = run(2)
        # uncached: both slots hold their own prompt pages; cached: the
        # second slot shares all six (aligned prefix) and adds one private
        # decode page.
        assert used_pages(cached) < used_pages(uncached)
        # drain both; every page must return (refcounts balance), except
        # the pages the cache entry still pins.
        cached.run_to_completion()
        pinned = {
            p for e in cached._prefix_cache.values() for p in e["pages"]
        } | {e["page"] for e in cached._page_cache.values()}
        assert used_pages(cached) == len(pinned)

    def test_eviction_releases_pages(self, vlm):
        cfg, model, params = vlm
        prompt_len, new = 8, 3
        server = PagedGenerationServer(
            model, params, num_slots=1, prompt_len=prompt_len,
            max_new_tokens=new, eos_token_id=-1, page_size=4,
            prefix_cache_size=1,
        )
        reqs = _requests(2, prompt_len, cfg.image_size, seed=8)
        for req in reqs:  # two distinct prompts through a size-1 LRU
            server.submit(*req)
            server.run_to_completion()
        assert len(server._prefix_cache) == 1
        # all pages back except what the two cache layers still pin (the
        # whole-prompt entry + the page-level LRU's per-page entries)
        used = (server.pool.num_pages - 1) - server.pool.free_pages
        entry = next(iter(server._prefix_cache.values()))
        pinned = set(entry["pages"]) | {
            e["page"] for e in server._page_cache.values()
        }
        assert used == len(pinned)

    def test_pool_copy_on_write_isolates_pages(self):
        """Pool-level COW: a private copy of a shared page diverges without
        touching the original (the property greedy e2e cannot observe)."""

        cfg = qwen2_tiny()
        pool = PagedKVPool(cfg, num_pages=6, page_size=4, num_slots=2,
                           max_len=8)
        pool.allocate(0, 4)  # slot 0 owns page A
        page_a = int(pool.page_table[0, 0])
        marked = pool.pool_k.at[:, page_a].set(7.0)
        pool.pool_k = marked
        # share into slot 1, then give slot 1 a private copy
        pool.install(1, 0, page_a)
        assert pool._refcount[page_a] == 2
        # emulate the server's COW: repoint slot 1 at a fresh page and copy
        pool.release_page(page_a)
        pool.page_table[1, 0] = 0
        pool.allocate(1, 4)
        page_b = int(pool.page_table[1, 0])
        assert page_b != page_a
        pool.pool_k = pool.pool_k.at[:, page_b].set(pool.pool_k[:, page_a])
        pool.pool_k = pool.pool_k.at[:, page_b, :, 0].set(-1.0)
        assert float(pool.pool_k[0, page_a, 0, 0, 0]) == 7.0
        assert float(pool.pool_k[0, page_b, 0, 0, 0]) == -1.0
        # refcount balance: freeing both slots returns every page
        pool.free(0)
        pool.free(1)
        assert pool.free_pages == 5


class TestPagedStepN:
    """Paged step_n: the scanned multi-tick program must match offline
    greedy generation exactly — on the kernel path and the gathered path,
    across page boundaries and multiple waves."""

    @pytest.mark.parametrize("decode_impl", ["gathered", "kernel"])
    def test_matches_offline(self, vlm, decode_impl):
        cfg, model, params = vlm
        max_new = 9  # > page_size=4: the scan crosses page boundaries
        server = PagedGenerationServer(
            model, params, num_slots=3, prompt_len=8, max_new_tokens=max_new,
            eos_token_id=-1, page_size=4, prefill_batch=2,
            decode_impl=decode_impl,
        )
        reqs = _requests(3, 8, 64, seed=41)
        rids = [server.submit(*r) for r in reqs]
        outputs = server.step_n(max_new)
        assert set(outputs) == set(rids)
        for rid, (ids, mask, img) in zip(rids, reqs):
            ref = np.asarray(
                generate(model, params, jnp.asarray(img), jnp.asarray(ids),
                         jnp.asarray(mask), max_new_tokens=max_new,
                         eos_token_id=-1)
            )[0]
            np.testing.assert_array_equal(np.asarray(outputs[rid]), ref)

    def test_multi_wave_with_int8_pool(self, vlm):
        cfg, model, params = vlm
        model8 = FastVLM(cfg.replace(
            text=cfg.text.replace(kv_cache_quantization="int8")))
        max_new = 5
        server = PagedGenerationServer(
            model8, params, num_slots=2, prompt_len=8, max_new_tokens=max_new,
            eos_token_id=-1, page_size=4, prefill_batch=2,
        )
        reqs = _requests(4, 8, 64, seed=42)  # 2 waves of 2
        outputs = {}
        rids = []
        i = 0
        while len(outputs) < len(reqs):
            while i < len(reqs) and server.has_free_slot():
                rids.append(server.submit(*reqs[i]))
                i += 1
            outputs.update(server.step_n(max_new))
        for rid, (ids, mask, img) in zip(rids, reqs):
            ref = np.asarray(
                generate(model8, params, jnp.asarray(img), jnp.asarray(ids),
                         jnp.asarray(mask), max_new_tokens=max_new,
                         eos_token_id=-1)
            )[0]
            np.testing.assert_array_equal(np.asarray(outputs[rid]), ref)
