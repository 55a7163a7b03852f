"""LoRA / QLoRA adapters (io/lora.py + models/qwen2.py::_lora_delta).

Anchors:
- B=0 makes the adapted model BIT-IDENTICAL to the base (the mount must be
  free until training moves B),
- runtime application == merged weights (``W + A @ B``) on a float base,
- gradients flow to the adapters through the frozen-backbone policy loss,
- QLoRA: adapters compose with int8-quantized bases,
- the policy trainable/frozen split carries the "lora" tree end to end.

No reference counterpart: the reference trains the head only, with the
backbone hard-frozen (reference ``fastvlm_adapter.py:501``
``@torch.no_grad``); LoRA is what makes backbone adaptation fit one chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_fastvlm_tpu.io.lora import (
    DEFAULT_LORA_TARGETS,
    init_lora,
    lora_num_params,
    merge_lora,
)
from vla_fastvlm_tpu.models.qwen2 import Qwen2ForCausalLM, qwen2_tiny


@pytest.fixture(scope="module")
def lm():
    cfg = qwen2_tiny()
    model = Qwen2ForCausalLM(cfg)
    ids = jnp.ones((2, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), input_ids=ids)["params"]
    return cfg, model, params


def _randomize_b(lora, seed=7, scale=0.05):
    leaves, treedef = jax.tree_util.tree_flatten_with_path(lora)
    out = []
    for i, (path, leaf) in enumerate(leaves):
        if path[-1].key == "b":
            key = jax.random.fold_in(jax.random.PRNGKey(seed), i)
            leaf = jax.random.normal(key, leaf.shape, leaf.dtype) * scale
        out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


class TestInit:
    def test_structure_and_stacked_shapes(self, lm):
        cfg, model, params = lm
        lora = init_lora(params, rank=4, rng=jax.random.PRNGKey(1))
        layers = lora["model"]["layers"]
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            site = layers["self_attn"][name]
            kshape = params["model"]["layers"]["self_attn"][name]["kernel"].shape
            assert site["a"].shape == (kshape[0], kshape[1], 4)
            assert site["b"].shape == (kshape[0], 4, kshape[2])
            assert not site["b"].any()
        for name in ("gate_proj", "up_proj", "down_proj"):
            assert name in layers["mlp"]
        # Nothing outside the decoder targets gets adapters.
        assert set(lora["model"].keys()) == {"layers"}
        assert lora_num_params(lora) > 0

    def test_alpha_scales_a_init(self, lm):
        cfg, model, params = lm
        small = init_lora(params, 4, jax.random.PRNGKey(1), alpha=1.0)
        big = init_lora(params, 4, jax.random.PRNGKey(1), alpha=16.0)
        a_s = small["model"]["layers"]["self_attn"]["q_proj"]["a"]
        a_b = big["model"]["layers"]["self_attn"]["q_proj"]["a"]
        np.testing.assert_allclose(
            np.asarray(a_b), np.asarray(a_s) * 16.0, rtol=1e-6
        )

    def test_no_targets_raises(self):
        with pytest.raises(ValueError, match="no LoRA targets"):
            init_lora({"dense": {"kernel": jnp.zeros((4, 4))}}, 2,
                      jax.random.PRNGKey(0))


class TestApply:
    def test_zero_b_is_bit_identical(self, lm):
        cfg, model, params = lm
        ids = jnp.arange(16, dtype=jnp.int32).reshape(2, 8) % 50
        lora = init_lora(params, 4, jax.random.PRNGKey(1))
        base, _, _ = model.apply({"params": params}, input_ids=ids)
        adapted, _, _ = model.apply(
            {"params": params, "lora": lora}, input_ids=ids
        )
        np.testing.assert_array_equal(np.asarray(base), np.asarray(adapted))

    def test_nonzero_b_changes_output(self, lm):
        cfg, model, params = lm
        ids = jnp.arange(16, dtype=jnp.int32).reshape(2, 8) % 50
        lora = _randomize_b(init_lora(params, 4, jax.random.PRNGKey(1)))
        base, _, _ = model.apply({"params": params}, input_ids=ids)
        adapted, _, _ = model.apply(
            {"params": params, "lora": lora}, input_ids=ids
        )
        assert np.abs(np.asarray(adapted) - np.asarray(base)).max() > 1e-4

    def test_runtime_matches_merged(self, lm):
        """x @ (W + A@B) == x @ W + (x@A)@B up to fp association."""
        cfg, model, params = lm
        ids = jnp.arange(16, dtype=jnp.int32).reshape(2, 8) % 50
        lora = _randomize_b(init_lora(params, 4, jax.random.PRNGKey(1)))
        runtime, _, _ = model.apply(
            {"params": params, "lora": lora}, input_ids=ids
        )
        merged, _, _ = model.apply(
            {"params": merge_lora(params, lora)}, input_ids=ids
        )
        np.testing.assert_allclose(
            np.asarray(runtime), np.asarray(merged), rtol=2e-4, atol=2e-4
        )

    def test_cached_decode_with_lora(self, lm):
        """Adapters apply on the serving path too (prefill + decode)."""
        from vla_fastvlm_tpu.models.qwen2 import init_kv_cache

        cfg, model, params = lm
        lora = _randomize_b(init_lora(params, 4, jax.random.PRNGKey(1)))
        merged = merge_lora(params, lora)
        ids = jnp.arange(8, dtype=jnp.int32).reshape(1, 8) % 50
        cache = init_kv_cache(cfg, 1, 12)
        _, _, cache_l = model.apply(
            {"params": params, "lora": lora}, input_ids=ids,
            attention_mask=jnp.ones_like(ids), cache=cache,
        )
        step_l, _, _ = model.apply(
            {"params": params, "lora": lora},
            input_ids=jnp.array([[3]], jnp.int32), cache=cache_l,
        )
        cache = init_kv_cache(cfg, 1, 12)
        _, _, cache_m = model.apply(
            {"params": merged}, input_ids=ids,
            attention_mask=jnp.ones_like(ids), cache=cache,
        )
        step_m, _, _ = model.apply(
            {"params": merged}, input_ids=jnp.array([[3]], jnp.int32),
            cache=cache_m,
        )
        np.testing.assert_allclose(
            np.asarray(step_l), np.asarray(step_m), rtol=2e-4, atol=2e-4
        )


class TestGrads:
    def test_b_gets_gradient_at_init_a_after(self, lm):
        cfg, model, params = lm
        ids = jnp.arange(16, dtype=jnp.int32).reshape(2, 8) % 50

        def loss(lora):
            logits, _, _ = model.apply(
                {"params": params, "lora": lora}, input_ids=ids
            )
            return jnp.mean(jnp.square(logits))

        lora0 = init_lora(params, 4, jax.random.PRNGKey(1))
        g0 = jax.grad(loss)(lora0)
        site = g0["model"]["layers"]["self_attn"]["q_proj"]
        # Standard LoRA: at B=0, dL/dB != 0 while dL/dA == 0.
        assert np.abs(np.asarray(site["b"])).max() > 0
        np.testing.assert_array_equal(np.asarray(site["a"]), 0)
        g1 = jax.grad(loss)(_randomize_b(lora0))
        assert np.abs(
            np.asarray(g1["model"]["layers"]["self_attn"]["q_proj"]["a"])
        ).max() > 0


class TestQuantizedBase:
    def test_qlora_int8_forward(self, lm):
        from vla_fastvlm_tpu.io.quantize import quantize_params

        cfg, model, params = lm
        qcfg = qwen2_tiny(quantization="int8")
        qmodel = Qwen2ForCausalLM(qcfg)
        qparams = quantize_params(params)
        ids = jnp.arange(16, dtype=jnp.int32).reshape(2, 8) % 50
        lora = _randomize_b(init_lora(qparams, 4, jax.random.PRNGKey(1)))
        base, _, _ = qmodel.apply({"params": qparams}, input_ids=ids)
        adapted, _, _ = qmodel.apply(
            {"params": qparams, "lora": lora}, input_ids=ids
        )
        assert np.isfinite(np.asarray(adapted)).all()
        assert np.abs(np.asarray(adapted) - np.asarray(base)).max() > 1e-4
        # The adapters see the same input the quantized matmul sees, so the
        # delta matches the float-base delta exactly per site; end to end
        # the difference is bounded by the base's own quantization error.
        float_lora, _, _ = model.apply(
            {"params": params, "lora": lora}, input_ids=ids
        )
        float_base, _, _ = model.apply({"params": params}, input_ids=ids)
        q_delta = np.asarray(adapted) - np.asarray(base)
        f_delta = np.asarray(float_lora) - np.asarray(float_base)
        assert np.abs(q_delta - f_delta).max() < np.abs(f_delta).max()

    def test_merge_into_quantized_raises(self, lm):
        from vla_fastvlm_tpu.io.quantize import quantize_params

        cfg, model, params = lm
        qparams = quantize_params(params)
        lora = init_lora(qparams, 4, jax.random.PRNGKey(1))
        with pytest.raises(TypeError, match="quantized"):
            merge_lora(qparams, lora)


TINY = dict(
    vlm_model_name="fastvlm-tiny",
    bootstrap_model_name="fastvlm-tiny",
    state_dim=4,
    action_dim=4,
    hidden_dim=16,
    fusion_dim=16,
    tokenizer_max_length=16,
    dropout=0.0,
)


class TestPolicyIntegration:
    def test_trainable_split_and_train_step(self):
        """lora_rank > 0: trainable = {head, lora}; one optimizer step moves
        the adapters and head while the frozen backbone stays untouched."""
        import optax

        from vla_fastvlm_tpu.fastvla import FastVLAConfig, FastVLAPolicy

        policy = FastVLAPolicy(FastVLAConfig(lora_rank=2, **TINY))
        trainable = policy.trainable_params()
        assert set(trainable) == {"head", "lora"}
        frozen = policy.frozen_params()
        assert set(frozen) == {"backbone"}

        rng = np.random.default_rng(0)
        arrays = policy.prepare_batch(
            {
                "images": rng.random((2, 3, 64, 64), np.float32),
                "states": rng.random((2, 4), np.float32),
                "actions": rng.random((2, 4), np.float32),
                "tasks": ["pick", "place"],
            }
        )
        tx = optax.adam(1e-2)
        opt_state = tx.init(trainable)

        @jax.jit
        def step(trainable, opt_state):
            grads = jax.grad(
                lambda t: policy.loss_fn(t, frozen, arrays)[0]
            )(trainable)
            updates, opt_state = tx.update(grads, opt_state, trainable)
            return optax.apply_updates(trainable, updates), opt_state, grads

        new_trainable, opt_state, grads = step(trainable, opt_state)
        g_lora = np.abs(
            np.asarray(
                grads["lora"]["language_model"]["layers"]["self_attn"][
                    "q_proj"
                ]["b"]
            )
        ).max()
        assert g_lora > 0  # gradient reached the adapters through pooling
        loss0 = policy.loss_fn(trainable, frozen, arrays)[0]
        loss1 = policy.loss_fn(new_trainable, frozen, arrays)[0]
        assert float(loss1) < float(loss0)

    def test_trainer_end_to_end_with_qlora(self, tmp_path):
        """Trainer drives a QLoRA policy (int8 frozen base + adapters):
        loss falls, checkpoints round-trip the lora tree."""
        from vla_fastvlm_tpu.data import (
            AlohaDataset,
            SyntheticAlohaSource,
            create_aloha_dataloader,
        )
        from vla_fastvlm_tpu.fastvla import FastVLAConfig, FastVLAPolicy
        from vla_fastvlm_tpu.training import Trainer, TrainingConfig

        policy = FastVLAPolicy(
            FastVLAConfig(lora_rank=2, quantization="int8", **TINY)
        )
        dataset = AlohaDataset(
            source=SyntheticAlohaSource(
                num_samples=8, image_hw=(32, 32), state_dim=4, action_dim=4
            )
        )
        loader = create_aloha_dataloader(dataset, batch_size=4, shuffle=False)
        trainer = Trainer(
            policy,
            loader,
            None,
            TrainingConfig(
                output_dir=str(tmp_path),
                learning_rate=5e-3,
                max_steps=4,
                logging_steps=10,
                eval_steps=10,
                save_steps=2,
                mixed_precision="no",
            ),
        )
        b0 = np.asarray(
            trainer.trainable["lora"]["language_model"]["layers"][
                "self_attn"
            ]["q_proj"]["b"]
        ).copy()
        trainer.fit()
        b1 = np.asarray(
            trainer.trainable["lora"]["language_model"]["layers"][
                "self_attn"
            ]["q_proj"]["b"]
        )
        assert np.abs(b1 - b0).max() > 0  # adapters actually trained
        # The synced policy carries the trained adapters (the model syncs
        # at checkpoint saves — max_steps is a save_steps multiple here).
        assert policy.model.lora is not None
        np.testing.assert_array_equal(
            np.asarray(
                policy.model.lora["language_model"]["layers"]["self_attn"][
                    "q_proj"
                ]["b"]
            ),
            b1,
        )

    def test_lora_zero_keeps_inference_identical(self):
        """Mounted-but-untrained adapters do not change policy actions."""
        from vla_fastvlm_tpu.fastvla import FastVLAConfig, FastVLAPolicy

        rng = np.random.default_rng(1)
        img = rng.random((1, 3, 64, 64), np.float32)
        state = rng.random((1, 4), np.float32)
        base = FastVLAPolicy(FastVLAConfig(**TINY))
        adapted = FastVLAPolicy(FastVLAConfig(lora_rank=2, **TINY))
        a0 = np.asarray(base.forward(img, state, ["task"]))
        a1 = np.asarray(adapted.forward(img, state, ["task"]))
        np.testing.assert_array_equal(a0, a1)

    def test_lora_with_full_backbone_training_raises(self):
        from vla_fastvlm_tpu.fastvla import FastVLAConfig, FastVLAPolicy

        with pytest.raises(ValueError, match="contradictory"):
            FastVLAPolicy(
                FastVLAConfig(
                    lora_rank=2,
                    freeze_backbone=False,
                    train_backbone=True,
                    **TINY,
                )
            )
