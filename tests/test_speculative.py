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
