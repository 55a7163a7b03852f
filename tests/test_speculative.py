"""Speculative decoding (serving/speculative.py).

The contract is EXACTNESS, not speed: for any (target, draft) pair sharing
a vocab, the emitted tokens must be identical to the target model's own
greedy ``serving.generate`` — the draft only changes how many target
forwards it takes to produce them. Random-weight tiny models make this a
strong test: draft/target agreement is near-chance, so rounds exercise
every acceptance count including a=0 (pure correction) and, with
draft == target, a=k (full acceptance + bonus token).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_fastvlm_tpu.models import FastVLM, fastvlm_tiny
from vla_fastvlm_tpu.serving import SpeculativeGenerator, generate


def _model(seed, **overrides):
    cfg = fastvlm_tiny()
    if overrides:
        cfg = cfg.replace(text=cfg.text.replace(**overrides))
    model = FastVLM(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    imgs = jnp.zeros((1, 3, cfg.image_size, cfg.image_size))
    params = model.init(jax.random.PRNGKey(seed), imgs, ids)["params"]
    return cfg, model, params


def _prompts(cfg, b, t, seed=0):
    rng = np.random.default_rng(seed)
    ids = np.zeros((b, t), np.int32)
    mask = np.zeros((b, t), np.int32)
    for row in range(b):
        length = int(rng.integers(2, t + 1))
        ids[row, :length] = rng.integers(3, 200, length)
        mask[row, :length] = 1
    imgs = rng.random((b, 3, cfg.image_size, cfg.image_size), np.float32)
    return jnp.asarray(imgs), jnp.asarray(ids), jnp.asarray(mask)


@pytest.fixture(scope="module")
def pair():
    cfg, target, tparams = _model(0)
    _, draft, dparams = _model(7)  # different weights, same arch/vocab
    return cfg, target, tparams, draft, dparams


class TestSpeculativeExactness:
    @pytest.mark.parametrize("k", [1, 2, 4])
    def test_matches_target_greedy(self, pair, k):
        cfg, target, tparams, draft, dparams = pair
        imgs, ids, mask = _prompts(cfg, b=3, t=8, seed=k)
        new = 12
        ref = generate(
            target, tparams, imgs, ids, mask,
            max_new_tokens=new, eos_token_id=-1, temperature=0.0,
        )
        gen = SpeculativeGenerator(
            target, tparams, draft, dparams, k=k, eos_token_id=-1
        )
        got = gen.generate(imgs, ids, mask, max_new_tokens=new)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_self_draft_full_acceptance(self, pair):
        """draft == target: every proposal is accepted (a = k each round),
        exercising the bonus-token path; output still exactly greedy."""
        cfg, target, tparams, _, _ = pair
        imgs, ids, mask = _prompts(cfg, b=2, t=6, seed=42)
        new = 10
        ref = generate(
            target, tparams, imgs, ids, mask,
            max_new_tokens=new, eos_token_id=-1, temperature=0.0,
        )
        gen = SpeculativeGenerator(
            target, tparams, target, tparams, k=3, eos_token_id=-1
        )
        got = gen.generate(imgs, ids, mask, max_new_tokens=new)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        # Full acceptance: each round yields k+1 tokens, so the host loop
        # runs ceil((new-1)/(k+1)) rounds; indirectly pinned by exactness.

    def test_eos_truncation_matches(self, pair):
        """Pick an eos id the model actually emits so rows finish early;
        the eos-padded tails must match generate()'s."""
        cfg, target, tparams, draft, dparams = pair
        imgs, ids, mask = _prompts(cfg, b=3, t=8, seed=5)
        new = 12
        probe = generate(
            target, tparams, imgs, ids, mask,
            max_new_tokens=new, eos_token_id=-1, temperature=0.0,
        )
        eos = int(np.asarray(probe)[0, new // 2])  # a token greedy decoding hits
        ref = generate(
            target, tparams, imgs, ids, mask,
            max_new_tokens=new, eos_token_id=eos, temperature=0.0,
        )
        gen = SpeculativeGenerator(
            target, tparams, draft, dparams, k=2, eos_token_id=eos
        )
        got = gen.generate(imgs, ids, mask, max_new_tokens=new)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_text_only(self):
        """image_token_mode='none' models (pure text serving) decode
        speculatively too."""
        def text_model(seed):
            cfg = fastvlm_tiny().replace(image_token_mode="none")
            model = FastVLM(cfg)
            params = model.init(
                jax.random.PRNGKey(seed), None, jnp.ones((1, 8), jnp.int32)
            )["params"]
            return cfg, model, params

        cfg, target, tparams = text_model(0)
        _, draft, dparams = text_model(7)
        _, ids, mask = _prompts(cfg, b=2, t=8, seed=9)
        new = 8
        ref = generate(
            target, tparams, None, ids, mask,
            max_new_tokens=new, eos_token_id=-1, temperature=0.0,
        )
        gen = SpeculativeGenerator(
            target, tparams, draft, dparams, k=3, eos_token_id=-1
        )
        got = gen.generate(None, ids, mask, max_new_tokens=new)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_vocab_mismatch_rejected(self, pair):
        cfg, target, tparams, _, _ = pair
        _, draft2, dparams2 = _model(3, vocab_size=cfg.text.vocab_size + 8)
        with pytest.raises(ValueError, match="vocab"):
            SpeculativeGenerator(target, tparams, draft2, dparams2)

    def test_untied_target(self):
        """Untied-lm_head target (the 7B shape): params must come from a
        ``prefill``-method init — plain __call__ never materializes the
        untied lm_head (policy trees correctly omit it), which is exactly
        how scripts/bench_speculative.py first fabricated a headless 7B."""
        from vla_fastvlm_tpu.serving.generate import build_cache

        def untied_model(seed):
            cfg = fastvlm_tiny()
            cfg = cfg.replace(text=cfg.text.replace(tie_word_embeddings=False))
            model = FastVLM(cfg)
            ids = jnp.ones((1, 8), jnp.int32)
            imgs = jnp.zeros((1, 3, cfg.image_size, cfg.image_size))
            cache = build_cache(cfg, 1, 8, 2)
            params = model.init(
                jax.random.PRNGKey(seed), imgs, ids, None, cache,
                method=FastVLM.prefill,
            )["params"]
            assert "lm_head" in params
            return cfg, model, params

        cfg, target, tparams = untied_model(0)
        _, draft, dparams = untied_model(5)
        imgs, ids, mask = _prompts(cfg, b=2, t=8, seed=3)
        new = 10
        ref = generate(
            target, tparams, imgs, ids, mask,
            max_new_tokens=new, eos_token_id=-1, temperature=0.0,
        )
        gen = SpeculativeGenerator(
            target, tparams, draft, dparams, k=3, eos_token_id=-1
        )
        got = gen.generate(imgs, ids, mask, max_new_tokens=new)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_quantized_target(self, pair):
        """int8 target + float draft: exact vs the int8 target's own
        greedy decode (the deployment pairing: quantized 7B target)."""
        from vla_fastvlm_tpu.io.quantize import quantize_params

        cfg, _, tparams, draft, dparams = pair
        qcfg = cfg.replace(text=cfg.text.replace(quantization="int8"))
        qtarget = FastVLM(qcfg)
        qparams = quantize_params(tparams, mode="int8")
        imgs, ids, mask = _prompts(cfg, b=2, t=8, seed=11)
        new = 10
        ref = generate(
            qtarget, qparams, imgs, ids, mask,
            max_new_tokens=new, eos_token_id=-1, temperature=0.0,
        )
        gen = SpeculativeGenerator(
            qtarget, qparams, draft, dparams, k=2, eos_token_id=-1
        )
        got = gen.generate(imgs, ids, mask, max_new_tokens=new)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestSpeculativeServer:
    """SpeculativeGenerationServer: continuous batching whose decode tick
    is a draft-verify round. The invariant is the same as the plain
    server's — every request's output must equal the target model's own
    offline greedy ``generate`` — plus the amortization mechanics: fewer
    ticks than tokens when the draft agrees."""

    PROMPT_LEN = 8
    MAX_NEW = 6
    EOS = 2

    def _server(self, target, tparams, draft, dparams, k=2, slots=3, bp=2):
        from vla_fastvlm_tpu.serving import SpeculativeGenerationServer

        return SpeculativeGenerationServer(
            target, tparams, draft, dparams, k=k,
            num_slots=slots, prompt_len=self.PROMPT_LEN,
            max_new_tokens=self.MAX_NEW, eos_token_id=self.EOS,
            prefill_batch=bp,
        )

    def _requests(self, cfg, n, seed=0):
        rng = np.random.default_rng(seed)
        out = []
        for i in range(n):
            length = int(rng.integers(3, self.PROMPT_LEN + 1))
            ids = np.zeros((1, self.PROMPT_LEN), np.int32)
            mask = np.zeros((1, self.PROMPT_LEN), np.int32)
            ids[0, :length] = rng.integers(3, 200, length)
            mask[0, :length] = 1
            imgs = rng.random(
                (1, 3, cfg.image_size, cfg.image_size), np.float32
            )
            out.append((imgs, ids, mask))
        return out

    def _offline(self, target, tparams, imgs, ids, mask):
        full = np.asarray(
            generate(
                target, tparams, jnp.asarray(imgs), jnp.asarray(ids),
                jnp.asarray(mask), max_new_tokens=self.MAX_NEW,
                eos_token_id=self.EOS, temperature=0.0,
            )
        )[0]
        # offline pads with eos after finishing; trim to the server's
        # emitted length (tokens up to and including the first eos)
        if self.EOS in full:
            return full[: int(np.argmax(full == self.EOS)) + 1]
        return full

    def test_staggered_admission_matches_offline(self, pair):
        cfg, target, tparams, draft, dparams = pair
        server = self._server(target, tparams, draft, dparams, k=2)
        reqs = self._requests(cfg, 5, seed=21)
        rids = {}
        outputs = {}
        # two up front, the rest admitted mid-flight as slots free up
        for i in range(2):
            rids[i] = server.submit(reqs[i][1], reqs[i][2], reqs[i][0])
        nxt = 2
        for _ in range(100):
            if nxt < len(reqs) and server.has_free_slot():
                rids[nxt] = server.submit(
                    reqs[nxt][1], reqs[nxt][2], reqs[nxt][0]
                )
                nxt += 1
            outputs.update(server.step())
            if nxt >= len(reqs) and not server.num_active:
                break
        assert len(outputs) == len(reqs)
        for i, (imgs, ids, mask) in enumerate(reqs):
            ref = self._offline(target, tparams, imgs, ids, mask)
            np.testing.assert_array_equal(
                np.asarray(outputs[rids[i]]), ref,
                err_msg=f"request {i} diverged from target greedy",
            )

    def test_self_draft_fewer_ticks(self, pair):
        """draft == target: full acceptance — the server drains in
        ceil((max_new-1)/(k+1)) ticks instead of max_new-1."""
        cfg, target, tparams, _, _ = pair
        k = 2
        server = self._server(target, tparams, target, tparams, k=k, slots=2)
        (imgs, ids, mask), = self._requests(cfg, 1, seed=3)
        rid = server.submit(ids, mask, imgs)
        ticks = 0
        outputs = {}
        while server.num_active and ticks < 50:
            outputs.update(server.step())
            ticks += 1
        ref = self._offline(target, tparams, imgs, ids, mask)
        np.testing.assert_array_equal(np.asarray(outputs[rid]), ref)
        emitted_after_first = len(outputs[rid]) - 1
        expected = -(-emitted_after_first // (k + 1)) if emitted_after_first else 0
        assert ticks <= max(expected, 1), (
            f"{ticks} ticks for {emitted_after_first} post-prefill tokens "
            f"at k={k} (full acceptance should need {expected})"
        )
        # acceptance observability: the live amortization counter matches
        if emitted_after_first:
            assert server.tokens_per_tick == pytest.approx(
                emitted_after_first / ticks
            )

    def test_slot_reuse_oversubscribed(self, pair):
        """More requests than slots: finished slots recycle, and the
        admission insert fully overwrites the abandoned speculative cache
        rows of the previous occupant."""
        cfg, target, tparams, draft, dparams = pair
        server = self._server(target, tparams, draft, dparams, k=3, slots=2)
        reqs = self._requests(cfg, 6, seed=8)
        rids = {}
        outputs = {}
        nxt = 0
        for _ in range(200):
            while nxt < len(reqs) and server.has_free_slot():
                rids[nxt] = server.submit(
                    reqs[nxt][1], reqs[nxt][2], reqs[nxt][0]
                )
                nxt += 1
            outputs.update(server.step())
            if nxt >= len(reqs) and not server.num_active:
                break
        assert len(outputs) == len(reqs)
        for i, (imgs, ids, mask) in enumerate(reqs):
            ref = self._offline(target, tparams, imgs, ids, mask)
            np.testing.assert_array_equal(np.asarray(outputs[rids[i]]), ref)

    def test_matches_plain_server(self, pair):
        """Same weights, same requests: the speculative server's outputs
        equal the plain GenerationServer's greedy outputs request-for-
        request (ticks differ; tokens must not)."""
        from vla_fastvlm_tpu.serving import GenerationServer

        cfg, target, tparams, draft, dparams = pair
        reqs = self._requests(cfg, 4, seed=13)
        plain = GenerationServer(
            target, tparams, num_slots=4, prompt_len=self.PROMPT_LEN,
            max_new_tokens=self.MAX_NEW, eos_token_id=self.EOS,
            prefill_batch=2,
        )
        spec = self._server(target, tparams, draft, dparams, k=2, slots=4)
        outs = []
        for server in (plain, spec):
            rids = [
                server.submit(ids, mask, imgs) for imgs, ids, mask in reqs
            ]
            done = server.run_to_completion(max_ticks=100)
            outs.append([done[r] for r in rids])
        for i, (a, b) in enumerate(zip(*outs)):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"request {i}: plain vs speculative server",
            )

    def test_vocab_mismatch_rejected(self, pair):
        cfg, target, tparams, _, _ = pair
        _, draft2, dparams2 = _model(3, vocab_size=cfg.text.vocab_size + 8)
        with pytest.raises(ValueError, match="vocab"):
            self._server(target, tparams, draft2, dparams2)

    def test_bad_k_rejected(self, pair):
        cfg, target, tparams, draft, dparams = pair
        with pytest.raises(ValueError, match="k must be"):
            self._server(target, tparams, draft, dparams, k=0)

    def test_int8_kv_cache_matches_plain_server(self):
        """int8 KV storage through verify_step + rollback (advisor r3 #4):
        the speculative server over an int8-KV target must emit exactly
        what the plain server does on the same int8-KV configuration —
        quantize-at-write is per (position, head), so the verify window's
        rows equal the single-step decode's regardless of program shape,
        and rollback (mask/index only) leaves stale scales that later
        writes overwrite before any read."""
        from vla_fastvlm_tpu.serving import GenerationServer

        cfg, target, tparams = _model(0, kv_cache_quantization="int8")
        _, draft, dparams = _model(7)
        reqs = self._requests(cfg, 4, seed=17)
        plain = GenerationServer(
            target, tparams, num_slots=4, prompt_len=self.PROMPT_LEN,
            max_new_tokens=self.MAX_NEW, eos_token_id=self.EOS,
            prefill_batch=2,
        )
        spec = self._server(target, tparams, draft, dparams, k=2, slots=4)
        outs = []
        for server in (plain, spec):
            rids = [
                server.submit(ids, mask, imgs) for imgs, ids, mask in reqs
            ]
            done = server.run_to_completion(max_ticks=100)
            outs.append([done[r] for r in rids])
        for i, (a, b) in enumerate(zip(*outs)):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"request {i}: int8-KV plain vs speculative server",
            )


def _tv(a: np.ndarray, b: np.ndarray, vocab: int) -> float:
    """Total-variation distance between two empirical token samples."""
    pa = np.bincount(a, minlength=vocab) / len(a)
    pb = np.bincount(b, minlength=vocab) / len(b)
    return 0.5 * float(np.abs(pa - pb).sum())


class TestSpeculativeSampling:
    """temperature > 0: rejection-sampling verification. The contract is
    DISTRIBUTIONAL exactness — emitted tokens follow the target's warped
    sampling distribution — not per-token identity (the RNG streams of the
    speculative and plain paths differ by construction)."""

    @pytest.mark.parametrize("top_p", [1.0, 0.8])
    def test_accept_rule_matches_target_distribution(self, top_p):
        """The acceptance/residual primitive itself: with fixed per-position
        draft/target distributions, the first emitted token must follow the
        warped target distribution p_0 and, conditioned on acceptance, the
        second must follow p_1 (the Leviathan et al. invariant)."""
        from vla_fastvlm_tpu.serving.sampling import (
            speculative_accept,
            warp_logits,
        )

        v, k, temp = 8, 3, 0.7
        rng = jax.random.PRNGKey(0)
        p_logits = jax.random.normal(jax.random.fold_in(rng, 2), (1, k + 1, v))
        # Draft approximates the target (the real deployment regime): with
        # independent random logits + top-p filtering the warped supports
        # can be disjoint, acceptance never fires, and the conditional
        # second-token check would be vacuous.
        q_logits = p_logits[:, :k] + 0.5 * jax.random.normal(
            jax.random.fold_in(rng, 1), (1, k, v)
        )

        def one(key):
            kd, ka = jax.random.split(key)
            dtoks = jax.random.categorical(
                kd, warp_logits(q_logits, temp, top_p), axis=-1
            ).astype(jnp.int32)
            a, corr = speculative_accept(
                dtoks, q_logits, p_logits, ka, temp, top_p
            )
            first = jnp.where(a[0] >= 1, dtoks[0, 0], corr[0])
            second = jnp.where(a[0] >= 2, dtoks[0, 1], corr[0])
            return first, second, a[0]

        n = 60000
        keys = jax.random.split(jax.random.PRNGKey(42), n)
        first, second, a = jax.jit(jax.vmap(one))(keys)
        first, second, a = np.asarray(first), np.asarray(second), np.asarray(a)

        p = np.asarray(
            jax.nn.softmax(warp_logits(p_logits, temp, top_p), axis=-1)
        )[0]
        emp0 = np.bincount(first, minlength=v) / n
        assert 0.5 * np.abs(emp0 - p[0]).sum() < 0.02, (
            f"first emitted token TV vs target p_0: {emp0} vs {p[0]}"
        )
        sel = second[a >= 1]
        emp1 = np.bincount(sel, minlength=v) / len(sel)
        assert 0.5 * np.abs(emp1 - p[1]).sum() < 0.02, (
            f"second emitted token TV vs target p_1: {emp1} vs {p[1]}"
        )

    def test_generator_distribution_matches_plain_sampling(self):
        """End to end: per-position marginals of the speculative generator
        match plain target sampling within the two-plain-runs noise floor
        (self-calibrating threshold)."""
        vocab, b, new = 32, 4096, 4
        temp, top_p = 0.8, 0.9

        def text_model(seed):
            cfg = fastvlm_tiny().replace(image_token_mode="none")
            cfg = cfg.replace(text=cfg.text.replace(vocab_size=vocab))
            model = FastVLM(cfg)
            params = model.init(
                jax.random.PRNGKey(seed), None, jnp.ones((1, 8), jnp.int32)
            )["params"]
            return cfg, model, params

        cfg, target, tparams = text_model(0)
        _, draft, dparams = text_model(7)
        prompt = np.full((1, 6), 5, np.int32)
        prompt[0] = [3, 9, 14, 2, 21, 7]
        ids = jnp.asarray(np.tile(prompt, (b, 1)))
        mask = jnp.ones((b, 6), jnp.int32)

        def plain(seed):
            return np.asarray(
                generate(
                    target, tparams, None, ids, mask, max_new_tokens=new,
                    eos_token_id=-1, temperature=temp, top_p=top_p,
                    rng=jax.random.PRNGKey(seed),
                )
            )

        ref_a, ref_b = plain(1), plain(2)
        gen = SpeculativeGenerator(
            target, tparams, draft, dparams, k=3, eos_token_id=-1,
            temperature=temp, top_p=top_p, seed=5,
        )
        got = np.asarray(gen.generate(None, ids, mask, max_new_tokens=new))
        for pos in range(new):
            null = _tv(ref_a[:, pos], ref_b[:, pos], vocab)
            spec = _tv(got[:, pos], ref_a[:, pos], vocab)
            assert spec < 2.0 * null + 0.03, (
                f"position {pos}: speculative-vs-plain TV {spec:.3f} exceeds "
                f"noise floor {null:.3f}"
            )
        # Discriminative check: the draft's own distribution is NOT the
        # target's — sampling from the draft directly must violate the same
        # bound at the first position (else the test proves nothing).
        draft_only = np.asarray(
            generate(
                draft, dparams, None, ids, mask, max_new_tokens=new,
                eos_token_id=-1, temperature=temp, top_p=top_p,
                rng=jax.random.PRNGKey(3),
            )
        )
        null0 = _tv(ref_a[:, 0], ref_b[:, 0], vocab)
        assert _tv(draft_only[:, 0], ref_a[:, 0], vocab) > 2.0 * null0 + 0.03

    def test_greedy_unchanged_by_sampling_params(self, pair):
        """temperature=0 ignores top_p/seed: bitwise the greedy contract."""
        cfg, target, tparams, draft, dparams = pair
        imgs, ids, mask = _prompts(cfg, b=2, t=8, seed=31)
        base = SpeculativeGenerator(
            target, tparams, draft, dparams, k=2, eos_token_id=-1
        ).generate(imgs, ids, mask, max_new_tokens=8)
        alt = SpeculativeGenerator(
            target, tparams, draft, dparams, k=2, eos_token_id=-1,
            temperature=0.0, top_p=0.5, seed=99,
        ).generate(imgs, ids, mask, max_new_tokens=8)
        np.testing.assert_array_equal(base, alt)

    def test_server_sampling_smoke(self, pair):
        """Sampled speculative server: drains, emits the exact budget per
        request, tokens within vocab (distribution pinned at generator
        level above; the server shares the same round program)."""
        from vla_fastvlm_tpu.serving import SpeculativeGenerationServer

        cfg, target, tparams, draft, dparams = pair
        server = SpeculativeGenerationServer(
            target, tparams, draft, dparams, k=2, num_slots=3,
            prompt_len=8, max_new_tokens=6, eos_token_id=-1,
            prefill_batch=2, temperature=0.9, top_p=0.95, seed=11,
        )
        rng = np.random.default_rng(0)
        reqs = []
        for _ in range(4):
            ids = rng.integers(3, 200, (1, 8)).astype(np.int32)
            mask = np.ones((1, 8), np.int32)
            imgs = rng.random((1, 3, cfg.image_size, cfg.image_size), np.float32)
            reqs.append((ids, mask, imgs))
        rids, done = [], {}
        for _ in range(60):
            while reqs and server.has_free_slot():
                rids.append(server.submit(*reqs.pop(0)))
            done.update(server.step())
            if not reqs and not server.num_active:
                break
        assert set(done) == set(rids)
        for toks in done.values():
            assert len(toks) == 6
            assert all(0 <= t < cfg.text.vocab_size for t in toks)


class TestSpeculativeTP:
    """Speculative serving on a TP mesh (VERDICT r4 ask #9): the target
    shards (params + cache/pools over the model axis, like the plain
    servers), the draft replicates, and GSPMD partitions the round program.
    Outputs must be token-identical to the single-device speculative server
    on the same requests."""

    PROMPT_LEN = 8
    MAX_NEW = 6
    EOS = 2

    def _requests(self, cfg, n, seed=0):
        rng = np.random.default_rng(seed)
        out = []
        for _ in range(n):
            length = int(rng.integers(3, self.PROMPT_LEN + 1))
            ids = np.zeros((1, self.PROMPT_LEN), np.int32)
            mask = np.zeros((1, self.PROMPT_LEN), np.int32)
            ids[0, :length] = rng.integers(3, 200, length)
            mask[0, :length] = 1
            imgs = rng.random(
                (1, 3, cfg.image_size, cfg.image_size), np.float32
            )
            out.append((imgs, ids, mask))
        return out

    def test_dense_tp_matches_single_device(self, pair):
        from vla_fastvlm_tpu.parallel import make_mesh
        from vla_fastvlm_tpu.serving import SpeculativeGenerationServer

        cfg, target, tparams, draft, dparams = pair
        mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
        kw = dict(
            k=2, num_slots=3, prompt_len=self.PROMPT_LEN,
            max_new_tokens=self.MAX_NEW, eos_token_id=self.EOS,
            prefill_batch=2,
        )
        tp = SpeculativeGenerationServer(
            target, tparams, draft, dparams, mesh=mesh, **kw
        )
        single = SpeculativeGenerationServer(
            target, tparams, draft, dparams, **kw
        )
        reqs = self._requests(cfg, 3, seed=51)
        rt = [tp.submit(ids, mask, imgs) for imgs, ids, mask in reqs]
        rs = [single.submit(ids, mask, imgs) for imgs, ids, mask in reqs]
        ot, os_ = tp.run_to_completion(), single.run_to_completion()
        for a, b in zip(rt, rs):
            assert ot[a] == os_[b]

    def test_paged_tp_matches_single_device(self, pair):
        from vla_fastvlm_tpu.parallel import make_mesh
        from vla_fastvlm_tpu.serving import SpeculativePagedGenerationServer

        cfg, target, tparams, draft, dparams = pair
        mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
        kw = dict(
            k=2, num_slots=3, prompt_len=self.PROMPT_LEN,
            max_new_tokens=self.MAX_NEW, eos_token_id=self.EOS,
            prefill_batch=2, page_size=4,
        )
        tp = SpeculativePagedGenerationServer(
            target, tparams, draft, dparams, mesh=mesh, **kw
        )
        single = SpeculativePagedGenerationServer(
            target, tparams, draft, dparams, **kw
        )
        reqs = self._requests(cfg, 3, seed=52)
        rt = [tp.submit(ids, mask, imgs) for imgs, ids, mask in reqs]
        rs = [single.submit(ids, mask, imgs) for imgs, ids, mask in reqs]
        ot, os_ = tp.run_to_completion(), single.run_to_completion()
        for a, b in zip(rt, rs):
            assert ot[a] == os_[b]
