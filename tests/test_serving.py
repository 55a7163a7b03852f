"""Serving tests: KV-cached generation, action queue, batched env runner."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_fastvlm_tpu.fastvla import FastVLAConfig, FastVLAPolicy
from vla_fastvlm_tpu.models import FastVLM, fastvlm_tiny, init_kv_cache
from vla_fastvlm_tpu.serving import (
    ActionQueuePolicy,
    BatchedEnvRunner,
    build_cache,
    generate,
)


class TestGenerate:
    @pytest.fixture(scope="class")
    def vlm(self):
        cfg = fastvlm_tiny()
        model = FastVLM(cfg)
        ids = jnp.ones((1, 8), jnp.int32)
        imgs = jnp.zeros((1, 3, 64, 64))
        params = model.init(jax.random.PRNGKey(0), imgs, ids)["params"]
        return cfg, model, params

    def test_greedy_generation_shape(self, vlm):
        cfg, model, params = vlm
        b, t = 2, 8
        ids = jnp.ones((b, t), jnp.int32) * 5
        mask = jnp.ones((b, t), jnp.int32)
        imgs = jnp.zeros((b, 3, 64, 64))
        tokens = generate(
            model, params, imgs, ids, mask, max_new_tokens=4, eos_token_id=2
        )
        assert tokens.shape == (b, 4)
        assert tokens.dtype == jnp.int32

    def test_decode_matches_full_forward(self, vlm):
        """Cached decode logits == uncached full-sequence logits."""
        cfg, model, params = vlm
        rng = np.random.default_rng(0)
        b, t = 1, 6
        ids = jnp.asarray(rng.integers(3, 100, (b, t)), jnp.int32)
        mask = jnp.ones((b, t), jnp.int32)
        imgs = jnp.asarray(rng.random((b, 3, 64, 64), dtype=np.float32))

        cache = build_cache(cfg, b, t, 3)
        last_logits, _, cache, seq_mask, _ = model.apply(
            {"params": params}, imgs, ids, mask, cache, method=FastVLM.prefill
        )
        next_tok = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)

        step_logits, _ = model.apply(
            {"params": params}, next_tok[:, None], cache, method=FastVLM.decode_step
        )

        # Reference: full forward over prompt + next token, no cache.
        full_ids = jnp.concatenate([ids, next_tok[:, None]], axis=1)
        full_mask = jnp.ones_like(full_ids)
        cache2 = build_cache(cfg, b, t + 1, 1)
        full_last, _, _, _, _ = model.apply(
            {"params": params}, imgs, full_ids, full_mask, cache2,
            method=FastVLM.prefill,
        )
        np.testing.assert_allclose(
            np.asarray(step_logits), np.asarray(full_last), atol=2e-4
        )

    def test_ragged_batch_decode_matches_unpadded(self, vlm):
        """Decode after a right-padded batched prefill must equal decoding
        each example alone without padding (RoPE on true lengths, causality
        on cache slots)."""
        cfg, model, params = vlm
        rng = np.random.default_rng(3)
        len_a, len_b, width = 3, 6, 6
        ids_a = rng.integers(3, 100, (1, len_a)).astype(np.int32)
        ids_b = rng.integers(3, 100, (1, len_b)).astype(np.int32)
        imgs = jnp.asarray(rng.random((2, 3, 64, 64), dtype=np.float32))

        # batched, right-padded
        ids = np.zeros((2, width), np.int32)
        mask = np.zeros((2, width), np.int32)
        ids[0, :len_a], mask[0, :len_a] = ids_a, 1
        ids[1, :len_b], mask[1, :len_b] = ids_b, 1
        cache = build_cache(cfg, 2, width, 2)
        last, _, cache, _, _ = model.apply(
            {"params": params}, imgs, jnp.asarray(ids), jnp.asarray(mask),
            cache, method=FastVLM.prefill,
        )
        tok = jnp.argmax(last, axis=-1).astype(jnp.int32)
        step_logits, _ = model.apply(
            {"params": params}, tok[:, None], cache, method=FastVLM.decode_step
        )

        # each example alone, unpadded
        for row, (one_ids, n) in enumerate([(ids_a, len_a), (ids_b, len_b)]):
            cache1 = build_cache(cfg, 1, n, 2)
            last1, _, cache1, _, _ = model.apply(
                {"params": params}, imgs[row:row + 1], jnp.asarray(one_ids),
                jnp.ones((1, n), jnp.int32), cache1, method=FastVLM.prefill,
            )
            np.testing.assert_allclose(
                np.asarray(last[row]), np.asarray(last1[0]), atol=2e-4
            )
            tok1 = jnp.argmax(last1, axis=-1).astype(jnp.int32)
            logits1, _ = model.apply(
                {"params": params}, tok1[:, None], cache1,
                method=FastVLM.decode_step,
            )
            np.testing.assert_allclose(
                np.asarray(step_logits[row]), np.asarray(logits1[0]), atol=2e-4
            )

    def test_eos_padding(self, vlm):
        cfg, model, params = vlm
        ids = jnp.ones((1, 4), jnp.int32) * 5
        mask = jnp.ones((1, 4), jnp.int32)
        imgs = jnp.zeros((1, 3, 64, 64))
        # Find the first greedy token, then declare it the EOS id: the whole
        # output must then be that token (done mask pads with eos).
        cache = build_cache(cfg, 1, 4, 1)
        last_logits, _, _, _, _ = model.apply(
            {"params": params}, imgs, ids, mask, cache, method=FastVLM.prefill
        )
        t0 = int(jnp.argmax(last_logits[0]))
        tokens = np.asarray(
            generate(model, params, imgs, ids, mask, max_new_tokens=5,
                     eos_token_id=t0)
        )
        assert (tokens[0] == t0).all()


class DummyEnv:
    """Gym-style env for runner tests: episode ends after N steps."""

    def __init__(self, horizon=3, dim=4):
        self.horizon = horizon
        self.dim = dim
        self.t = 0

    def reset(self):
        self.t = 0
        return {
            "image": np.zeros((3, 32, 32), np.float32),
            "state": np.zeros(self.dim, np.float32),
        }

    def step(self, action):
        self.t += 1
        obs = {
            "image": np.zeros((3, 32, 32), np.float32),
            "state": np.full(self.dim, self.t, np.float32),
        }
        return obs, 1.0, self.t >= self.horizon, {}


@pytest.fixture(scope="module")
def tiny_policy():
    return FastVLAPolicy(
        FastVLAConfig(
            vlm_model_name="fastvlm-tiny",
            bootstrap_model_name="fastvlm-tiny",
            state_dim=4,
            action_dim=4,
            hidden_dim=16,
            fusion_dim=16,
            tokenizer_max_length=16,
            dropout=0.0,
        )
    )


class TestActionQueue:
    def test_chunk1_runs_forward_every_step(self, tiny_policy):
        wrapper = ActionQueuePolicy(tiny_policy, n_action_steps=1)
        batch = {
            "images": np.zeros((2, 3, 32, 32), np.float32),
            "states": np.zeros((2, 4), np.float32),
            "tasks": ["go", "go"],
        }
        a1 = wrapper.select_action(batch)
        assert a1.shape == (2, 4)
        assert len(wrapper._action_queue) == 0  # popped immediately

    def test_chunked_policy_queue(self):
        policy = FastVLAPolicy(
            FastVLAConfig(
                vlm_model_name="fastvlm-tiny",
                bootstrap_model_name="fastvlm-tiny",
                state_dim=4,
                action_dim=4,
                hidden_dim=16,
                fusion_dim=16,
                tokenizer_max_length=16,
                chunk_size=3,
                dropout=0.0,
            )
        )
        wrapper = ActionQueuePolicy(policy, n_action_steps=3)
        batch = {
            "images": np.zeros((1, 3, 32, 32), np.float32),
            "states": np.zeros((1, 4), np.float32),
            "tasks": ["go"],
        }
        chunk = wrapper.predict_action_chunk(batch)
        assert chunk.shape == (1, 3, 4)
        a1 = wrapper.select_action(batch)
        assert len(wrapper._action_queue) == 2  # 3 queued, 1 popped
        a2 = wrapper.select_action(batch)
        a3 = wrapper.select_action(batch)
        np.testing.assert_allclose(np.stack([a1, a2, a3], axis=1), chunk)

    def test_n_action_steps_guard(self, tiny_policy):
        with pytest.raises(ValueError, match="n_action_steps"):
            ActionQueuePolicy(tiny_policy, n_action_steps=2)


class TestBatchedEnvRunner:
    def test_rollout(self, tiny_policy):
        envs = [DummyEnv(horizon=2), DummyEnv(horizon=4)]
        runner = BatchedEnvRunner(
            envs, ActionQueuePolicy(tiny_policy, 1), task="press the button"
        )
        result = runner.run(max_steps=10)
        assert result["lengths"].tolist() == [2, 4]
        assert result["returns"].tolist() == [2.0, 4.0]
        assert result["done"].all()

    def test_staggered_matches_serial(self, tiny_policy):
        """stagger>1 pipelines env groups against the device without changing
        closed-loop semantics: deterministic envs+policy give identical
        rollouts (group g's actions still come from group g's current obs)."""

        class StatefulEnv:
            """Obs/reward depend on received actions -> any staleness or
            group-routing error changes returns."""

            def __init__(self, seed, horizon):
                self.horizon = horizon
                self.rng = np.random.default_rng(seed)
                self.t = 0
                self.state = np.zeros(4, np.float32)
                self.base = self.rng.standard_normal((3, 32, 32)).astype(
                    np.float32
                )

            def _obs(self):
                return {
                    "image": self.base + 0.1 * self.t,
                    "state": self.state.copy(),
                }

            def reset(self):
                self.t = 0
                self.state = np.zeros(4, np.float32)
                return self._obs()

            def step(self, action):
                self.t += 1
                self.state = 0.5 * self.state + np.asarray(
                    action[:4], np.float32
                )
                reward = float(self.state.sum())
                return self._obs(), reward, self.t >= self.horizon, {}

        def make_envs():
            return [StatefulEnv(seed=i, horizon=3 + (i % 2)) for i in range(5)]

        serial = BatchedEnvRunner(
            make_envs(), ActionQueuePolicy(tiny_policy, 1), task="go"
        ).run(max_steps=6)
        ticks = []
        staggered = BatchedEnvRunner(
            make_envs(), ActionQueuePolicy(tiny_policy, 1), task="go"
        ).run(max_steps=6, on_step=lambda a, d: ticks.append(a.copy()), stagger=2)
        np.testing.assert_allclose(
            staggered["returns"], serial["returns"], rtol=1e-5
        )
        assert staggered["lengths"].tolist() == serial["lengths"].tolist()
        assert len(ticks) == 4  # max horizon
        assert all(t.shape == (5, 4) for t in ticks)

    def test_stagger_guard(self, tiny_policy):
        runner = BatchedEnvRunner(
            [DummyEnv(horizon=2)], ActionQueuePolicy(tiny_policy, 1)
        )
        with pytest.raises(ValueError, match="stagger"):
            runner.run(max_steps=2, stagger=2)
