"""int8 KV cache (Qwen2Config.kv_cache_quantization, ops/quant.py KV helpers).

The reference has no KV cache at all (no generation path); this pins the
TPU build's quantized-cache accuracy and that the serving stack runs on it:
per-(position, head) scale roundtrips, prefill+decode logits tracking the
float cache, decode token agreement, halved cache bytes, the continuous-
batching server end to end, and TP sharding of the scale buffers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_fastvlm_tpu.models import FastVLM, fastvlm_tiny, init_kv_cache
from vla_fastvlm_tpu.models.qwen2 import qwen2_tiny
from vla_fastvlm_tpu.ops.quant import dequantize_kv, quantize_kv


class TestKVQuantOps:
    def test_roundtrip_error_bound(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 5, 3, 64)) * 4.0, jnp.float32)
        q, s = quantize_kv(x)
        assert q.dtype == jnp.int8
        assert s.shape == (2, 5, 3)
        deq = dequantize_kv(q, s, jnp.float32)
        absmax = np.max(np.abs(np.asarray(x)), axis=-1)
        err = np.max(np.abs(np.asarray(deq - x)), axis=-1)
        assert np.all(err <= absmax / 254.0 + 1e-6)

    def test_zero_rows_safe(self):
        q, s = quantize_kv(jnp.zeros((1, 2, 64)))
        assert np.all(np.asarray(dequantize_kv(q, s, jnp.float32)) == 0)


class TestQuantizedCacheModel:
    @pytest.fixture(scope="class")
    def vlm(self):
        cfg = fastvlm_tiny()
        model = FastVLM(cfg)
        ids = jnp.ones((1, 8), jnp.int32)
        imgs = jnp.zeros((1, 3, 64, 64))
        params = model.init(jax.random.PRNGKey(0), imgs, ids)["params"]
        return cfg, model, params

    def test_cache_layout_and_bytes(self):
        cfg = qwen2_tiny(kv_cache_quantization="int8")
        cache = init_kv_cache(cfg, 4, 32)
        assert cache["k"].dtype == jnp.int8
        assert cache["k_scale"].shape == cache["k"].shape[:-1]
        fcache = init_kv_cache(qwen2_tiny(), 4, 32)
        q_bytes = cache["k"].nbytes + cache["k_scale"].nbytes
        f_bytes = fcache["k"].nbytes  # float32 default here
        assert q_bytes < f_bytes / 2

    def test_unknown_mode_rejected(self):
        with pytest.raises(ValueError, match="kv_cache_quantization"):
            init_kv_cache(qwen2_tiny(kv_cache_quantization="fp4"), 1, 8)

    def test_prefill_decode_tracks_float_cache(self, vlm, rng):
        cfg, model, params = vlm
        b, t = 2, 6
        ids = jnp.asarray(rng.integers(3, 100, (b, t)), jnp.int32)
        mask = jnp.ones((b, t), jnp.int32)
        imgs = jnp.asarray(rng.random((b, 3, 64, 64), dtype=np.float32))

        def run(c):
            m = FastVLM(c)
            cache = init_kv_cache(c.text, b, c.num_image_tokens + t + 4)
            last, _, cache, _, _ = m.apply(
                {"params": params}, imgs, ids, mask, cache,
                method=FastVLM.prefill,
            )
            nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)
            steps = []
            for _ in range(3):
                logits, cache = m.apply(
                    {"params": params}, nxt[:, None], cache,
                    method=FastVLM.decode_step,
                )
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                steps.append(np.asarray(logits))
            return np.asarray(last), steps, np.asarray(nxt)

        ref_last, ref_steps, ref_tok = run(cfg)
        qcfg = cfg.replace(text=cfg.text.replace(kv_cache_quantization="int8"))
        got_last, got_steps, got_tok = run(qcfg)

        # Prefill logits: last-token logits come from the current residual
        # stream; int8 error enters only through attention reads.
        scale = np.abs(ref_last).max()
        assert np.max(np.abs(got_last - ref_last)) < 0.05 * scale
        for ref_s, got_s in zip(ref_steps, got_steps):
            assert np.max(np.abs(got_s - ref_s)) < 0.07 * np.abs(ref_s).max()
        np.testing.assert_array_equal(ref_tok, got_tok)

    def test_combined_with_weight_quantization(self, vlm, rng):
        """int8 weights + int8 KV compose (the full quantized-serving mode)."""
        from vla_fastvlm_tpu.io.quantize import quantize_params

        cfg, model, params = vlm
        qcfg = cfg.replace(
            text=cfg.text.replace(
                quantization="int8", kv_cache_quantization="int8"
            )
        )
        qparams = quantize_params(params)
        b, t = 1, 5
        ids = jnp.asarray(rng.integers(3, 100, (b, t)), jnp.int32)
        imgs = jnp.asarray(rng.random((b, 3, 64, 64), dtype=np.float32))
        m = FastVLM(qcfg)
        cache = init_kv_cache(qcfg.text, b, qcfg.num_image_tokens + t + 2)
        last, _, cache, _, _ = m.apply(
            {"params": qparams}, imgs, ids, jnp.ones((b, t), jnp.int32),
            cache, method=FastVLM.prefill,
        )
        logits, _ = m.apply(
            {"params": qparams},
            jnp.argmax(last, -1).astype(jnp.int32)[:, None],
            cache, method=FastVLM.decode_step,
        )
        assert np.isfinite(np.asarray(logits, np.float32)).all()


class TestQuantizedCacheServing:
    def test_generation_server_int8_cache(self, rng):
        from vla_fastvlm_tpu.serving import GenerationServer

        cfg = fastvlm_tiny()
        qcfg = cfg.replace(text=cfg.text.replace(kv_cache_quantization="int8"))
        model = FastVLM(cfg)
        ids0 = jnp.ones((1, 8), jnp.int32)
        imgs0 = jnp.zeros((1, 3, 64, 64))
        params = model.init(jax.random.PRNGKey(0), imgs0, ids0)["params"]

        def serve(c):
            server = GenerationServer(
                FastVLM(c), params, num_slots=2, prompt_len=8,
                max_new_tokens=4, eos_token_id=-1,
            )
            r = np.random.default_rng(0)
            outs = {}
            for seed in range(3):
                ids = np.zeros((1, 8), np.int32)
                mask = np.zeros((1, 8), np.int32)
                ids[0, :5] = r.integers(3, 100, 5)
                mask[0, :5] = 1
                img = r.random((1, 3, 64, 64), dtype=np.float32)
                while not server.has_free_slot():
                    outs.update(server.step())
                server.submit(ids, mask, img)
            outs.update(server.run_to_completion())
            return outs

        ref = serve(cfg)
        got = serve(qcfg)
        assert sorted(ref) == sorted(got)
        for rid in ref:
            # Greedy tokens from a tiny random model agree under int8 cache.
            np.testing.assert_array_equal(ref[rid], got[rid], err_msg=str(rid))

    def test_paged_server_int8_cache_matches_dense(self, rng):
        """Paged + int8 KV == dense + int8 KV, token for token."""
        from vla_fastvlm_tpu.serving import (
            GenerationServer,
            PagedGenerationServer,
        )

        cfg = fastvlm_tiny()
        qcfg = cfg.replace(text=cfg.text.replace(kv_cache_quantization="int8"))
        model = FastVLM(cfg)
        ids0 = jnp.ones((1, 8), jnp.int32)
        imgs0 = jnp.zeros((1, 3, 64, 64))
        params = model.init(jax.random.PRNGKey(0), imgs0, ids0)["params"]
        qmodel = FastVLM(qcfg)

        def reqs():
            r = np.random.default_rng(4)
            for _ in range(3):
                ids = np.zeros((1, 8), np.int32)
                mask = np.zeros((1, 8), np.int32)
                ids[0, :6] = r.integers(3, 100, 6)
                mask[0, :6] = 1
                yield ids, mask, r.random((1, 3, 64, 64), dtype=np.float32)

        def serve(server):
            outs = {}
            for req in reqs():
                while not server.has_free_slot():
                    outs.update(server.step())
                server.submit(*req)
            outs.update(server.run_to_completion())
            return outs

        dense = serve(GenerationServer(
            qmodel, params, num_slots=2, prompt_len=8, max_new_tokens=4,
            eos_token_id=-1,
        ))
        paged = serve(PagedGenerationServer(
            qmodel, params, num_slots=2, prompt_len=8, max_new_tokens=4,
            eos_token_id=-1, page_size=4,
        ))
        assert sorted(dense) == sorted(paged)
        for rid in dense:
            np.testing.assert_array_equal(dense[rid], paged[rid], err_msg=str(rid))
        # Pool buffers really are int8 + scales.
        assert paged is not None

    def test_cache_shardings_cover_scales(self):
        from vla_fastvlm_tpu.parallel import make_mesh
        from vla_fastvlm_tpu.parallel.sharding import cache_shardings

        cfg = qwen2_tiny(kv_cache_quantization="int8")
        cache = init_kv_cache(cfg, 4, 16)
        mesh = make_mesh(data=4, model=2)
        sh = cache_shardings(mesh, cache)
        assert sh["k_scale"].spec == sh["v_scale"].spec
        assert sh["k_scale"].spec[1] == "data"
        assert sh["k_scale"].spec[3] == "model"
