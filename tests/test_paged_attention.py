"""Pallas paged-attention decode kernel (ops/pallas/paged_attention.py).

Exactness anchors:
- kernel (interpreter mode) vs the XLA gather fallback on random pools,
  ragged masks, and trash-page tables — the two differ only in softmax
  summation order, so fp32 agreement is tight;
- the paged server's ``decode_impl="kernel"`` path (which routes through
  ``FastVLM.decode_step_paged`` + the fallback on CPU) vs the round-2
  ``"gathered"`` window program, token-exact end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_fastvlm_tpu.models import FastVLM, fastvlm_tiny
from vla_fastvlm_tpu.ops.attention import paged_attention
from vla_fastvlm_tpu.ops.pallas.paged_attention import (
    paged_attention_decode,
    paged_attention_window,
    supports_paged_kernel,
)
from vla_fastvlm_tpu.serving.paged_kv import PagedGenerationServer


def _setup(b=3, n=4, kv=2, d=64, page=16, p_slot=3, p_total=8, seed=0):
    rng = np.random.default_rng(seed)
    s_max = p_slot * page
    q = jnp.asarray(rng.standard_normal((b, 1, n, d)), jnp.float32)
    pool_k = jnp.asarray(
        rng.standard_normal((p_total, kv, page, d)), jnp.float32
    )
    pool_v = jnp.asarray(
        rng.standard_normal((p_total, kv, page, d)), jnp.float32
    )
    k_new = jnp.asarray(rng.standard_normal((b, 1, kv, d)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((b, 1, kv, d)), jnp.float32)
    # Slot 0: 2 pages + ragged tail; slot 1: 1 page; slot 2: inactive
    # (all-trash table, empty mask — attends only its own new token).
    tables = np.zeros((b, p_slot), np.int32)
    tables[0, :2] = [3, 5]
    tables[1, :1] = [2]
    mask = np.zeros((b, s_max), bool)
    mask[0, : page + 7] = True
    mask[1, :page] = True
    lengths = np.array([page + 7, page, 1], np.int32)
    return q, pool_k, pool_v, jnp.asarray(tables), jnp.asarray(mask), jnp.asarray(lengths), k_new, v_new


class TestKernelExactness:
    def test_interpret_matches_fallback(self):
        q, pk, pv, tables, mask, lengths, kn, vn = _setup()
        ref = paged_attention(
            q, pk, pv, tables, mask, lengths, kn, vn, impl="xla"
        )
        got = paged_attention_decode(
            q[:, 0], pk, pv, tables, mask, kn[:, 0], vn[:, 0], interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref[:, 0]), rtol=2e-5, atol=2e-5
        )

    def test_interpret_int8_pool_matches_fallback(self):
        """int8 pools: the kernel's stage-time dequant (per-position x
        kv-head scales) agrees with the XLA fallback's gather-then-dequant
        on the same quantized pools."""
        from vla_fastvlm_tpu.ops.quant import dequantize_kv, quantize_kv

        q, pk, pv, tables, mask, lengths, kn, vn = _setup(seed=3)
        pk_q, pk_s = quantize_kv(pk)  # (P, K, page, D) int8 + (P, K, page)
        pv_q, pv_s = quantize_kv(pv)
        # New rows arrive dequant-roundtripped (the model quantizes them for
        # the pool scatter and attends with what the pool will hold).
        kn_dq = dequantize_kv(*quantize_kv(kn), jnp.float32)
        vn_dq = dequantize_kv(*quantize_kv(vn), jnp.float32)
        ref = paged_attention(
            q, pk_q, pv_q, tables, mask, lengths, kn_dq, vn_dq,
            pool_k_scale=pk_s, pool_v_scale=pv_s, impl="xla",
        )
        got = paged_attention_decode(
            q[:, 0], pk_q, pv_q, tables, mask, kn_dq[:, 0], vn_dq[:, 0],
            pool_k_scale=pk_s, pool_v_scale=pv_s, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref[:, 0]), rtol=2e-5, atol=2e-5
        )

    def test_gqa_grouping(self):
        # 6 query heads over 2 kv heads (rep=3).
        q, pk, pv, tables, mask, lengths, kn, vn = _setup(n=6, kv=2, seed=1)
        ref = paged_attention(
            q, pk, pv, tables, mask, lengths, kn, vn, impl="xla"
        )
        got = paged_attention_decode(
            q[:, 0], pk, pv, tables, mask, kn[:, 0], vn[:, 0], interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref[:, 0]), rtol=2e-5, atol=2e-5
        )

    def test_empty_mask_attends_only_self(self):
        """An inactive slot (all-false mask) must softmax solely over its
        own new token — out == v_new exactly, no NaN from 0/0."""
        q, pk, pv, tables, mask, lengths, kn, vn = _setup(seed=2)
        got = paged_attention_decode(
            q[:, 0], pk, pv, tables, mask, kn[:, 0], vn[:, 0], interpret=True
        )
        got = np.asarray(got)
        assert np.isfinite(got).all()
        # slot 2: empty mask -> probs = one-hot on the new token
        rep = q.shape[2] // kn.shape[2]
        expect = np.repeat(np.asarray(vn)[2, 0], rep, axis=0)
        np.testing.assert_allclose(got[2], expect, rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("n,kv", [(4, 2), (6, 2)])
    def test_window_matches_fallback(self, n, kv):
        """W > 1 (speculative verify window): the multi-query kernel agrees
        with the XLA gathered fallback, including the slot-causal triangle
        among the window's own columns."""
        w = 3
        rng = np.random.default_rng(7)
        q, pk, pv, tables, mask, lengths, _, _ = _setup(n=n, kv=kv, seed=7)
        d = q.shape[-1]
        q = jnp.asarray(rng.standard_normal((q.shape[0], w, n, d)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((q.shape[0], w, kv, d)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((q.shape[0], w, kv, d)), jnp.float32)
        ref = paged_attention(
            q, pk, pv, tables, mask, lengths, kn, vn, impl="xla"
        )
        got = paged_attention_window(
            q, pk, pv, tables, mask, kn, vn, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_window_int8_pool_matches_fallback(self):
        from vla_fastvlm_tpu.ops.quant import dequantize_kv, quantize_kv

        w = 3
        rng = np.random.default_rng(9)
        q, pk, pv, tables, mask, lengths, _, _ = _setup(seed=9)
        b, _, n, d = q.shape
        kv = pk.shape[1]
        q = jnp.asarray(rng.standard_normal((b, w, n, d)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((b, w, kv, d)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((b, w, kv, d)), jnp.float32)
        pk_q, pk_s = quantize_kv(pk)
        pv_q, pv_s = quantize_kv(pv)
        kn_dq = dequantize_kv(*quantize_kv(kn), jnp.float32)
        vn_dq = dequantize_kv(*quantize_kv(vn), jnp.float32)
        ref = paged_attention(
            q, pk_q, pv_q, tables, mask, lengths, kn_dq, vn_dq,
            pool_k_scale=pk_s, pool_v_scale=pv_s, impl="xla",
        )
        got = paged_attention_window(
            q, pk_q, pv_q, tables, mask, kn_dq, vn_dq,
            pool_k_scale=pk_s, pool_v_scale=pv_s, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_window_empty_mask_causal_self(self):
        """An inactive slot's window attends only its own (causal) new
        columns: position 0 -> exactly v_new[0]; no NaN anywhere."""
        w = 3
        rng = np.random.default_rng(10)
        q, pk, pv, tables, mask, lengths, _, _ = _setup(seed=10)
        b, _, n, d = q.shape
        kv = pk.shape[1]
        q = jnp.asarray(rng.standard_normal((b, w, n, d)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((b, w, kv, d)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((b, w, kv, d)), jnp.float32)
        got = np.asarray(
            paged_attention_window(
                q, pk, pv, tables, mask, kn, vn, interpret=True
            )
        )
        assert np.isfinite(got).all()
        rep = n // kv
        # slot 2 has an empty stored mask: window position 0 sees only the
        # first new column -> output is v_new[2, 0] repeated over q heads.
        expect = np.repeat(np.asarray(vn)[2, 0], rep, axis=0)
        np.testing.assert_allclose(got[2, 0], expect, rtol=1e-6, atol=1e-6)

    def test_supports_gating(self):
        assert not supports_paged_kernel((8, 2, 16, 64), 4, jnp.float32, "cpu")
        # Bare int8 pools (no scales) have no dequant story; with the scale
        # pools along (kv_cache_quantization="int8") the kernel applies.
        assert not supports_paged_kernel((8, 2, 16, 64), 4, jnp.int8, "tpu")
        assert supports_paged_kernel(
            (8, 2, 16, 64), 4, jnp.int8, "tpu", has_scales=True
        )
        assert not supports_paged_kernel((8, 2, 4, 64), 4, jnp.float32, "tpu")
        assert not supports_paged_kernel((8, 2, 16, 48), 4, jnp.float32, "tpu")
        assert not supports_paged_kernel((8, 3, 16, 64), 4, jnp.float32, "tpu")
        assert supports_paged_kernel((8, 2, 16, 64), 4, jnp.float32, "tpu")


@pytest.fixture(scope="module")
def vlm():
    cfg = fastvlm_tiny()
    model = FastVLM(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    imgs = jnp.zeros((1, 3, 64, 64))
    params = model.init(jax.random.PRNGKey(0), imgs, ids)["params"]
    return cfg, model, params


class TestKernelServerPath:
    def test_kernel_decode_matches_gathered(self, vlm):
        """decode_impl='kernel' (rows-only decode) emits exactly the tokens
        the round-2 gathered-window program emits, across interleaved
        submits, early finishes, and page reuse."""
        cfg, model, params = vlm
        prompt_len, new = 8, 6
        rng = np.random.default_rng(11)
        reqs = []
        for _ in range(5):
            length = int(rng.integers(2, prompt_len + 1))
            ids = np.zeros((1, prompt_len), np.int32)
            mask = np.zeros((1, prompt_len), np.int32)
            ids[0, :length] = rng.integers(3, 100, length)
            mask[0, :length] = 1
            img = rng.random((1, 3, cfg.image_size, cfg.image_size), np.float32)
            reqs.append((ids, mask, img))

        def run(impl):
            server = PagedGenerationServer(
                model, params, num_slots=3, prompt_len=prompt_len,
                max_new_tokens=new, eos_token_id=-1, page_size=4,
                decode_impl=impl,
            )
            outputs = {}
            for ids, mask, img in reqs:
                while not server.has_free_slot():
                    outputs.update(server.step())
                server.submit(ids, mask, img)
            outputs.update(server.run_to_completion())
            return outputs

        ref = run("gathered")
        got = run("kernel")
        assert sorted(ref) == sorted(got)
        for rid in ref:
            np.testing.assert_array_equal(
                np.asarray(got[rid]), np.asarray(ref[rid]), err_msg=f"req {rid}"
            )

    def test_kernel_decode_matches_gathered_int8_pool(self, vlm):
        """int8 pools through the kernel tick (round 3): quantized pages +
        scale pools flow through ``decode_step_paged`` and the per-row
        quantize-for-scatter, emitting exactly the gathered int8 program's
        tokens. (On CPU both routes share the XLA fallback math; the Pallas
        int8 staging itself is pinned in TestKernelExactness and measured
        on-chip — BASELINE.md.)"""
        cfg, model, params = vlm
        qcfg = cfg.replace(text=cfg.text.replace(kv_cache_quantization="int8"))
        qmodel = FastVLM(qcfg)
        prompt_len, new = 8, 6
        rng = np.random.default_rng(13)
        reqs = []
        for _ in range(4):
            length = int(rng.integers(2, prompt_len + 1))
            ids = np.zeros((1, prompt_len), np.int32)
            mask = np.zeros((1, prompt_len), np.int32)
            ids[0, :length] = rng.integers(3, 100, length)
            mask[0, :length] = 1
            img = rng.random((1, 3, cfg.image_size, cfg.image_size), np.float32)
            reqs.append((ids, mask, img))

        def run(impl):
            server = PagedGenerationServer(
                qmodel, params, num_slots=3, prompt_len=prompt_len,
                max_new_tokens=new, eos_token_id=-1, page_size=4,
                decode_impl=impl,
            )
            outputs = {}
            for ids, mask, img in reqs:
                while not server.has_free_slot():
                    outputs.update(server.step())
                server.submit(ids, mask, img)
            outputs.update(server.run_to_completion())
            return outputs

        ref = run("gathered")
        got = run("kernel")
        assert sorted(ref) == sorted(got)
        for rid in ref:
            np.testing.assert_array_equal(
                np.asarray(got[rid]), np.asarray(ref[rid]), err_msg=f"req {rid}"
            )
