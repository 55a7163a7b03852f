"""Autoregressive action-token policy (models/action_tokens.py,
fastvla/token_policy.py, serving/token_policy_server.py).

Anchors:
- tokenizer codec: roundtrip within half a bin, clipping, vocab-tail id
  range, stray-id clipping;
- teacher-forced CE trains: LoRA memorizes a tiny batch (loss drops,
  token_accuracy -> 1.0) — pins that gradients flow to the RIGHT logit
  positions under ragged prompts (a one-off index bug cannot memorize);
- greedy predict reproduces the memorized action tokens end to end;
- the serving bridge (TokenPolicyServer over the paged server) emits
  bit-identical actions to the policy's own jitted prefill+scan decode;
- the speculative-paged composition (self-draft) matches the plain paged
  server request-for-request.
"""

import numpy as np
import pytest

from vla_fastvlm_tpu.fastvla import FastVLAConfig, FastVLMTokenPolicy
from vla_fastvlm_tpu.models.action_tokens import ActionTokenizer


class TestActionTokenizer:
    def test_roundtrip_within_half_bin(self):
        tok = ActionTokenizer(vocab_size=512, num_bins=128, low=-1.0, high=1.0)
        vals = np.linspace(-1.0, 1.0, 37, dtype=np.float32).reshape(1, 37)
        out = tok.decode(tok.encode(vals))
        assert np.all(np.abs(out - vals) <= tok.bin_width / 2 + 1e-6)

    def test_clipping_to_edge_bins(self):
        tok = ActionTokenizer(vocab_size=512, num_bins=64)
        ids = tok.encode(np.array([-5.0, 5.0, -1.0, 1.0]))
        assert ids[0] == tok.base_id and ids[2] == tok.base_id
        assert ids[1] == 511 and ids[3] == 511

    def test_vocab_tail_id_range(self):
        tok = ActionTokenizer(vocab_size=512, num_bins=64)
        rng = np.random.default_rng(0)
        ids = tok.encode(rng.standard_normal((8, 14)))
        assert ids.min() >= tok.base_id == 448 and ids.max() < 512

    def test_stray_ids_clip_on_decode(self):
        tok = ActionTokenizer(vocab_size=512, num_bins=64)
        lowest = tok.decode(np.array([tok.base_id]))[0]
        highest = tok.decode(np.array([511]))[0]
        assert tok.decode(np.array([0]))[0] == lowest  # below codebook
        assert tok.decode(np.array([10_000]))[0] == highest

    def test_decode_jnp_matches_numpy(self):
        import jax.numpy as jnp

        tok = ActionTokenizer(vocab_size=512, num_bins=64)
        ids = np.array([[448, 470, 511, 3]])
        np.testing.assert_allclose(
            np.asarray(tok.decode_jnp(jnp.asarray(ids))), tok.decode(ids)
        )

    def test_validation(self):
        with pytest.raises(ValueError):
            ActionTokenizer(vocab_size=512, num_bins=1)
        with pytest.raises(ValueError):
            ActionTokenizer(vocab_size=128, num_bins=256)
        with pytest.raises(ValueError):
            ActionTokenizer(vocab_size=512, num_bins=8, low=1.0, high=-1.0)


def _tiny_config(**kw):
    base = dict(
        vlm_model_name="fastvlm-tiny",
        bootstrap_model_name="fastvlm-tiny",
        state_dim=3,
        action_dim=4,
        action_head="token",
        action_bins=64,
        dropout=0.0,
        tokenizer_max_length=16,
    )
    base.update(kw)
    return FastVLAConfig(**base)


def _batch(b=2, image_size=64, state_dim=3, action_dim=4, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "images": rng.random((b, 3, image_size, image_size), np.float32),
        "states": rng.standard_normal((b, state_dim)).astype(np.float32) * 0.5,
        # ragged prompts: different true lengths exercise the packing
        "tasks": ["pick", "insert the peg carefully"][:b] if b <= 2 else ["go"] * b,
        "actions": np.clip(
            rng.standard_normal((b, action_dim)).astype(np.float32) * 0.5, -1, 1
        ),
    }


@pytest.fixture(scope="module")
def lora_policy():
    return FastVLMTokenPolicy(_tiny_config(lora_rank=8))


class TestTokenPolicyTraining:
    def test_loss_runs_shapes_and_metrics(self, lora_policy):
        metrics = lora_policy.compute_loss(_batch())
        assert set(metrics) >= {"loss", "mse", "token_accuracy"}
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["mse"]))

    def test_requires_trainables(self):
        policy = FastVLMTokenPolicy(_tiny_config())  # inference-only: fine
        with pytest.raises(ValueError, match="no head parameters"):
            policy.trainable_params()

    def test_lora_memorizes_batch_and_predict_reproduces(self, lora_policy):
        """CE memorization on ragged prompts pins the predictor-index math:
        gradients at shifted positions could not drive token_accuracy to 1.
        Greedy decode must then reproduce the exact memorized bins."""
        import jax
        import optax

        policy = lora_policy
        batch = _batch()
        arrays = policy.prepare_batch(batch)
        trainable = policy.trainable_params()
        frozen = policy.frozen_params()
        tx = optax.adam(3e-2)
        opt_state = tx.init(trainable)
        grad_fn = jax.jit(
            jax.value_and_grad(policy.loss_fn, has_aux=True),
            static_argnames=("train",),
        )

        (loss0, _), _ = grad_fn(trainable, frozen, arrays)
        metrics = None
        for _ in range(60):
            (loss, metrics), grads = grad_fn(trainable, frozen, arrays)
            updates, opt_state = tx.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
        assert float(loss) < float(loss0) * 0.1
        assert float(metrics["token_accuracy"]) == 1.0

        policy.load_params(policy.merge_trainable(trainable))
        actions = np.asarray(
            policy.forward(batch["images"], batch["states"], batch["tasks"])
        )
        np.testing.assert_array_equal(
            policy.tokenizer.encode(actions),
            policy.tokenizer.encode(batch["actions"]),
        )
        # and the decoded values sit within half a bin of the targets
        assert np.all(
            np.abs(actions - batch["actions"])
            <= policy.tokenizer.bin_width / 2 + 1e-6
        )


class TestTokenPolicyServing:
    def test_paged_server_matches_jitted_predict(self):
        from vla_fastvlm_tpu.serving import PagedGenerationServer, TokenPolicyServer

        policy = FastVLMTokenPolicy(_tiny_config())
        batch = _batch(b=3, seed=3)
        batch["tasks"] = ["pick", "insert the peg", "push"]
        ref = np.asarray(
            policy.forward(batch["images"], batch["states"], batch["tasks"])
        )

        ids, _ = policy.backbone._prep_text(
            policy.processor.prepare_tasks(batch["tasks"], batch_size=3)
        )
        width = ids.shape[1] + policy.config.state_dim
        server = PagedGenerationServer(
            policy.backbone.model,
            policy.backbone.params,
            num_slots=2,  # < B: forces multi-wave draining within one tick
            prompt_len=width,
            max_new_tokens=policy.config.action_dim,
            eos_token_id=-1,
            page_size=4,
            prefill_batch=2,
        )
        bridge = TokenPolicyServer(policy, server)
        got = bridge.forward(batch["images"], batch["states"], batch["tasks"])
        np.testing.assert_array_equal(got, ref)
        # Batched tick (VERDICT r4 ask #4): 3 requests / 2 slots = 2 waves,
        # each wave ONE scanned decode program instead of action_dim ticks.
        assert bridge.server_programs == 2
        assert bridge.server_ticks == 2 * (policy.config.action_dim - 1)

    def test_spec_paged_server_matches_plain(self):
        from vla_fastvlm_tpu.serving import (
            PagedGenerationServer,
            SpeculativePagedGenerationServer,
            TokenPolicyServer,
        )

        policy = FastVLMTokenPolicy(_tiny_config())
        batch = _batch(b=3, seed=4)
        batch["tasks"] = ["pick", "insert the peg", "push"]
        ids, _ = policy.backbone._prep_text(
            policy.processor.prepare_tasks(batch["tasks"], batch_size=3)
        )
        width = ids.shape[1] + policy.config.state_dim
        kwargs = dict(
            num_slots=2,
            prompt_len=width,
            max_new_tokens=policy.config.action_dim,
            eos_token_id=-1,
            page_size=4,
            prefill_batch=2,
        )
        model, params = policy.backbone.model, policy.backbone.params
        plain = TokenPolicyServer(
            policy, PagedGenerationServer(model, params, **kwargs)
        )
        ref = plain.forward(batch["images"], batch["states"], batch["tasks"])
        spec = TokenPolicyServer(
            policy,
            SpeculativePagedGenerationServer(
                model, params, model, params, k=2, **kwargs  # self-draft
            ),
        )
        got = spec.forward(batch["images"], batch["states"], batch["tasks"])
        np.testing.assert_array_equal(got, ref)

    def test_image_prep_matches_host_letterbox(self):
        """Round-5 raw-frame admission (closed-loop tunnel-traffic fix):
        servers built with ``image_prep=prepare_policy_images`` letterbox
        INSIDE the jitted admission programs, so the TokenPolicyServer
        submits raw env-resolution frames. Must be bit-identical to the
        fallback path (host-side jitted letterbox, tower-size submission)
        on dense, paged, and speculative-paged servers."""
        from vla_fastvlm_tpu.model.fastvlm_adapter import prepare_policy_images
        from vla_fastvlm_tpu.serving import (
            GenerationServer,
            PagedGenerationServer,
            SpeculativePagedGenerationServer,
            TokenPolicyServer,
        )

        policy = FastVLMTokenPolicy(_tiny_config())
        batch = _batch(b=3, seed=6)
        batch["tasks"] = ["pick", "insert the peg", "push"]
        ids, _ = policy.backbone._prep_text(
            policy.processor.prepare_tasks(batch["tasks"], batch_size=3)
        )
        width = ids.shape[1] + policy.config.state_dim
        mcfg = policy.backbone.model_config
        bcfg = policy.backbone.config
        model, params = policy.backbone.model, policy.backbone.params
        kwargs = dict(
            num_slots=2,
            prompt_len=width,
            max_new_tokens=policy.config.action_dim,
            eos_token_id=-1,
            prefill_batch=2,
        )
        prep = lambda imgs: prepare_policy_images(imgs, mcfg, bcfg)  # noqa: E731

        ref = TokenPolicyServer(
            policy, PagedGenerationServer(model, params, page_size=4, **kwargs)
        ).forward(batch["images"], batch["states"], batch["tasks"])

        for server in (
            GenerationServer(model, params, image_prep=prep, **kwargs),
            PagedGenerationServer(
                model, params, page_size=4, image_prep=prep, **kwargs
            ),
            PagedGenerationServer(  # chunked admission preps the image chunk
                model, params, page_size=4, prefill_chunk_tokens=8,
                image_prep=prep,
                # chunked buckets must be chunk-multiples; submit() pads up
                **{**kwargs, "prompt_len": -(-width // 8) * 8},
            ),
            SpeculativePagedGenerationServer(  # draft prefill preps too
                model, params, model, params, k=2, page_size=4,
                image_prep=prep, **kwargs,
            ),
        ):
            bridge = TokenPolicyServer(policy, server)
            got = bridge.forward(batch["images"], batch["states"], batch["tasks"])
            np.testing.assert_array_equal(got, ref)

    def test_untied_decoder_serves_tokens(self, monkeypatch):
        """Regression (round-5 7B closed-loop crash): untied presets keep a
        separate lm_head Dense that the backbone's feature-path init never
        traced, so the owned tree had NO lm_head leaf and every logits
        surface (generation servers, this policy) died with KeyError at 7B
        while tied tiny/0.5B worked. The backbone now inits through
        forward_logits when untied. Pin at tiny scale with an untied
        resolver."""
        import vla_fastvlm_tpu.model.fastvlm_adapter as adapter_mod

        real_resolve = adapter_mod.resolve_fastvlm_config

        def untied_resolve(*args, **kwargs):
            mcfg, raw = real_resolve(*args, **kwargs)
            return (
                mcfg.replace(text=mcfg.text.replace(tie_word_embeddings=False)),
                raw,
            )

        monkeypatch.setattr(
            adapter_mod, "resolve_fastvlm_config", untied_resolve
        )
        from vla_fastvlm_tpu.serving import GenerationServer, TokenPolicyServer

        policy = FastVLMTokenPolicy(_tiny_config())
        assert "lm_head" in policy.backbone.params
        batch = _batch(b=2, seed=7)
        ref = np.asarray(
            policy.forward(batch["images"], batch["states"], batch["tasks"])
        )
        ids, _ = policy.backbone._prep_text(
            policy.processor.prepare_tasks(batch["tasks"], batch_size=2)
        )
        server = GenerationServer(
            policy.backbone.model,
            policy.backbone.params,
            num_slots=2,
            prompt_len=ids.shape[1] + policy.config.state_dim,
            max_new_tokens=policy.config.action_dim,
            eos_token_id=-1,
            prefill_batch=2,
        )
        got = TokenPolicyServer(policy, server).forward(
            batch["images"], batch["states"], batch["tasks"]
        )
        np.testing.assert_array_equal(got, ref)

    def test_server_guards(self):
        from vla_fastvlm_tpu.serving import PagedGenerationServer, TokenPolicyServer

        policy = FastVLMTokenPolicy(_tiny_config())
        model, params = policy.backbone.model, policy.backbone.params
        bad_new = PagedGenerationServer(
            model, params, num_slots=2, prompt_len=24,
            max_new_tokens=policy.config.action_dim + 1,
            eos_token_id=-1, page_size=4,
        )
        with pytest.raises(ValueError, match="action_dim"):
            TokenPolicyServer(policy, bad_new)
        bad_eos = PagedGenerationServer(
            model, params, num_slots=2, prompt_len=24,
            max_new_tokens=policy.config.action_dim,
            eos_token_id=2, page_size=4,
        )
        with pytest.raises(ValueError, match="eos_token_id"):
            TokenPolicyServer(policy, bad_eos)


class TestTokenPolicyChunkingMulticam:
    """Round-5 wiring (VERDICT r4 ask #3): the token head composes with
    action chunking (decode chunk*action_dim tokens) and multi-camera
    observations (folded-view letterbox), like the MLP head."""

    def test_chunked_memorization_and_predict(self):
        """CE memorization with chunk_size=2 pins the predictor-index math
        over the LONGER action-token tail; greedy predict must reproduce
        the memorized (B, chunk, D) bins through the scanned decode."""
        import jax
        import optax

        policy = FastVLMTokenPolicy(
            _tiny_config(chunk_size=2, action_dim=2, lora_rank=8)
        )
        rng = np.random.default_rng(7)
        batch = {
            "images": rng.random((2, 3, 64, 64), np.float32),
            "states": rng.standard_normal((2, 3)).astype(np.float32) * 0.5,
            "tasks": ["pick", "insert the peg carefully"],
            # time-major (B, T, D) with T > chunk: only the first chunk
            # steps supervise
            "actions": np.clip(
                rng.standard_normal((2, 3, 2)).astype(np.float32) * 0.5, -1, 1
            ),
        }
        arrays = policy.prepare_batch(batch)
        assert arrays["action_tokens"].shape == (2, 4)  # chunk * action_dim
        assert arrays["actions"].shape == (2, 2, 2)

        trainable = policy.trainable_params()
        frozen = policy.frozen_params()
        tx = optax.adam(3e-2)
        opt_state = tx.init(trainable)
        grad_fn = jax.jit(
            jax.value_and_grad(policy.loss_fn, has_aux=True),
            static_argnames=("train",),
        )
        (loss0, _), _ = grad_fn(trainable, frozen, arrays)
        metrics = None
        for _ in range(60):
            (loss, metrics), grads = grad_fn(trainable, frozen, arrays)
            updates, opt_state = tx.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
        assert float(loss) < float(loss0) * 0.1
        assert float(metrics["token_accuracy"]) == 1.0

        policy.load_params(policy.merge_trainable(trainable))
        actions = np.asarray(
            policy.forward(batch["images"], batch["states"], batch["tasks"])
        )
        assert actions.shape == (2, 2, 2)  # (B, chunk, action_dim)
        np.testing.assert_array_equal(
            policy.tokenizer.encode(actions),
            policy.tokenizer.encode(batch["actions"][:, :2]),
        )

    def test_chunked_server_matches_jitted_predict(self):
        from vla_fastvlm_tpu.serving import (
            PagedGenerationServer,
            TokenPolicyServer,
        )

        policy = FastVLMTokenPolicy(_tiny_config(chunk_size=3))
        batch = _batch(b=3, seed=5)
        batch["tasks"] = ["pick", "insert the peg", "push"]
        ref = np.asarray(
            policy.forward(batch["images"], batch["states"], batch["tasks"])
        )
        assert ref.shape == (3, 3, 4)  # (B, chunk, action_dim)

        ids, _ = policy.backbone._prep_text(
            policy.processor.prepare_tasks(batch["tasks"], batch_size=3)
        )
        width = ids.shape[1] + policy.config.state_dim
        server = PagedGenerationServer(
            policy.backbone.model,
            policy.backbone.params,
            num_slots=2,
            prompt_len=width,
            max_new_tokens=policy.num_action_tokens,  # 12
            eos_token_id=-1,
            page_size=4,
            prefill_batch=2,
        )
        bridge = TokenPolicyServer(policy, server)
        got = bridge.forward(batch["images"], batch["states"], batch["tasks"])
        np.testing.assert_array_equal(got, ref)

    def test_multicam_loss_and_server_match(self):
        from vla_fastvlm_tpu.serving import GenerationServer, TokenPolicyServer

        policy = FastVLMTokenPolicy(_tiny_config(num_cameras=2))
        rng = np.random.default_rng(9)
        batch = {
            "images": rng.random((2, 2, 3, 64, 64), np.float32),  # (B, ncam, ...)
            "states": rng.standard_normal((2, 3)).astype(np.float32) * 0.5,
            "tasks": ["pick", "insert"],
            "actions": np.clip(
                rng.standard_normal((2, 4)).astype(np.float32) * 0.5, -1, 1
            ),
        }
        # loss path runs with folded-view letterbox
        policy2 = FastVLMTokenPolicy(
            _tiny_config(num_cameras=2, lora_rank=4)
        )
        metrics = policy2.compute_loss(batch)
        assert np.isfinite(float(metrics["loss"]))

        ref = np.asarray(
            policy.forward(batch["images"], batch["states"], batch["tasks"])
        )
        assert ref.shape == (2, 4)
        ids, _ = policy.backbone._prep_text(
            policy.processor.prepare_tasks(batch["tasks"], batch_size=2)
        )
        width = ids.shape[1] + policy.config.state_dim
        server = GenerationServer(
            policy.backbone.model,
            policy.backbone.params,
            num_slots=2,
            prompt_len=width,
            max_new_tokens=policy.num_action_tokens,
            eos_token_id=-1,
            prefill_batch=2,
        )
        bridge = TokenPolicyServer(policy, server)
        got = bridge.forward(batch["images"], batch["states"], batch["tasks"])
        np.testing.assert_array_equal(got, ref)

    def test_chunk_needs_time_major_targets(self):
        policy = FastVLMTokenPolicy(_tiny_config(chunk_size=2, lora_rank=4))
        batch = _batch()
        batch["actions"] = batch["actions"]  # (B, D): no time axis
        with pytest.raises(ValueError, match="time-major"):
            policy.prepare_batch(batch)
