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
