"""Sampling (serving/sampling.py) and sampled serving paths.

The reference has no generation/sampling surface (its policy pools features,
reference ``fastvlm_adapter.py:551-560``); this pins the TPU build's
greedy/temperature/top-p semantics and that both continuous-batching servers
accept sampling knobs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_fastvlm_tpu.serving import sample_tokens


class TestSampleTokens:
    def test_greedy_is_argmax(self, rng):
        logits = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
        out = sample_tokens(logits, None, temperature=0.0)
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(logits).argmax(-1)
        )

    def test_greedy_requires_no_key_but_sampling_does(self, rng):
        logits = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
        with pytest.raises(ValueError, match="PRNG key"):
            sample_tokens(logits, None, temperature=1.0)

    def test_tiny_top_p_collapses_to_argmax(self, rng):
        logits = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
        out = sample_tokens(
            logits, jax.random.PRNGKey(0), temperature=1.0, top_p=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(logits).argmax(-1)
        )

    def test_low_temperature_concentrates(self, rng):
        logits = jnp.asarray(rng.standard_normal((1, 16)), jnp.float32)
        outs = {
            int(sample_tokens(logits, jax.random.PRNGKey(i), 0.01)[0])
            for i in range(16)
        }
        assert outs == {int(np.asarray(logits).argmax())}

    def test_top_p_excludes_tail(self):
        # 3-token dist: p = [0.6, 0.3, 0.1]; top_p=0.8 keeps tokens 0 and 1.
        logits = jnp.log(jnp.asarray([[0.6, 0.3, 0.1]]))
        seen = {
            int(sample_tokens(logits, jax.random.PRNGKey(i), 1.0, 0.8)[0])
            for i in range(200)
        }
        assert 2 not in seen
        assert seen == {0, 1}

    def test_deterministic_per_key(self, rng):
        logits = jnp.asarray(rng.standard_normal((3, 100)), jnp.float32)
        a = sample_tokens(logits, jax.random.PRNGKey(7), 1.0, 0.9)
        b = sample_tokens(logits, jax.random.PRNGKey(7), 1.0, 0.9)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestSampledServers:
    @pytest.fixture(scope="class")
    def vlm(self):
        from vla_fastvlm_tpu.models import FastVLM, fastvlm_tiny

        cfg = fastvlm_tiny()
        model = FastVLM(cfg)
        ids = jnp.ones((1, 8), jnp.int32)
        imgs = jnp.zeros((1, 3, 64, 64))
        params = model.init(jax.random.PRNGKey(0), imgs, ids)["params"]
        return cfg, model, params

    def _req(self, cfg, prompt_len, seed=0):
        r = np.random.default_rng(seed)
        ids = np.zeros((1, prompt_len), np.int32)
        mask = np.zeros((1, prompt_len), np.int32)
        ids[0, :5] = r.integers(3, 100, 5)
        mask[0, :5] = 1
        img = r.random((1, 3, cfg.image_size, cfg.image_size), dtype=np.float32)
        return ids, mask, img

    @pytest.mark.parametrize("server_kind", ["dense", "paged"])
    def test_sampled_server_runs_and_greedy_matches_default(self, vlm, server_kind):
        from vla_fastvlm_tpu.serving import GenerationServer, PagedGenerationServer

        cfg, model, params = vlm
        prompt_len, new = 8, 4

        def build(**kw):
            if server_kind == "dense":
                return GenerationServer(
                    model, params, num_slots=2, prompt_len=prompt_len,
                    max_new_tokens=new, eos_token_id=-1, **kw,
                )
            return PagedGenerationServer(
                model, params, num_slots=2, prompt_len=prompt_len,
                max_new_tokens=new, eos_token_id=-1, page_size=4, **kw,
            )

        req = self._req(cfg, prompt_len)
        default = build()
        default.submit(*req)
        ref = default.run_to_completion()

        greedy = build(temperature=0.0, top_p=1.0)
        greedy.submit(*req)
        got = greedy.run_to_completion()
        for rid in ref:
            np.testing.assert_array_equal(ref[rid], got[rid])

        sampled = build(temperature=1.5, seed=3)
        sampled.submit(*req)
        out = sampled.run_to_completion()
        (tokens,) = out.values()
        assert len(tokens) == new
        assert all(0 <= t < cfg.text.vocab_size for t in tokens)

    def test_generate_top_p(self, vlm):
        from vla_fastvlm_tpu.serving import generate

        cfg, model, params = vlm
        ids = jnp.ones((2, 8), jnp.int32) * 5
        mask = jnp.ones((2, 8), jnp.int32)
        imgs = jnp.zeros((2, 3, 64, 64))
        toks = generate(
            model, params, imgs, ids, mask, max_new_tokens=3,
            eos_token_id=-1, temperature=0.8, top_p=0.9,
            rng=jax.random.PRNGKey(1),
        )
        assert toks.shape == (2, 3)
        # tiny top_p == greedy
        greedy = generate(
            model, params, imgs, ids, mask, max_new_tokens=3, eos_token_id=-1
        )
        near_greedy = generate(
            model, params, imgs, ids, mask, max_new_tokens=3,
            eos_token_id=-1, temperature=1.0, top_p=1e-6,
            rng=jax.random.PRNGKey(2),
        )
        np.testing.assert_array_equal(np.asarray(greedy), np.asarray(near_greedy))
