"""Multi-device tests on the 8-device virtual CPU mesh (conftest).

SURVEY.md §4: the JAX-idiomatic fake-cluster trick replaces the reference's
(absent) distributed test harness. Verifies TP parameter sharding, DP batch
sharding, and that a fully sharded train step runs and matches the
single-device result.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from vla_fastvlm_tpu.fastvla import FastVLAConfig, FastVLAPolicy
from vla_fastvlm_tpu.parallel import (
    make_mesh,
    param_shardings,
    shard_batch,
    shard_params,
    spec_for_param,
)


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


def make_arrays(policy, batch=8):
    rng = np.random.default_rng(0)
    batch_dict = {
        "images": rng.random((batch, 3, 32, 32), dtype=np.float32),
        "states": rng.standard_normal((batch, 4)).astype(np.float32),
        "actions": rng.standard_normal((batch, 4)).astype(np.float32),
        "tasks": ["move"] * batch,
    }
    return policy.prepare_batch(batch_dict)


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(data=4, model=2)
        assert mesh.shape == {"data": 4, "model": 2}
        mesh = make_mesh(model=2)  # data absorbs the rest
        assert mesh.shape == {"data": 4, "model": 2}

    def test_bad_factorization(self):
        with pytest.raises(ValueError):
            make_mesh(data=3, model=2)
        with pytest.raises(ValueError):
            make_mesh(model=5)


class TestShardingRules:
    def test_tp_specs_right_aligned(self):
        # scan-stacked decoder kernel (L, in, out): layer axis unsharded.
        spec = spec_for_param(
            ("language_model", "layers", "self_attn", "q_proj", "kernel"), 3
        )
        assert spec == P(None, None, "model")
        spec = spec_for_param(
            ("language_model", "layers", "mlp", "down_proj", "kernel"), 3
        )
        assert spec == P(None, "model", None)
        # unscanned rank-2 variant
        assert spec_for_param(("self_attn", "o_proj", "kernel"), 2) == P("model", None)

    def test_non_tp_replicated(self):
        assert spec_for_param(("vision_tower", "stem_0", "conv", "kernel"), 4) == P()
        assert spec_for_param(("head", "action_head", "kernel"), 2) == P()

    def test_row_split_scale_is_shape_dependent(self):
        # int4 group scales (K/G, N) on row-split kernels follow the kernel's
        # contraction split; int8 per-column scales (1, N) replicate.
        assert spec_for_param(
            ("self_attn", "o_proj", "scale"), 2, (28, 896)
        ) == P("model", None)
        assert spec_for_param(
            ("mlp", "down_proj", "scale"), 2, (38, 896)
        ) == P("model", None)
        assert spec_for_param(("self_attn", "o_proj", "scale"), 2, (1, 896)) == P()
        # scan-stacked (L, K/G, N): layer axis unsharded.
        assert spec_for_param(
            ("layers", "mlp", "down_proj", "scale"), 3, (24, 38, 896)
        ) == P(None, "model", None)
        # column-split int4 scales keep the existing output-column rule.
        assert spec_for_param(
            ("self_attn", "q_proj", "scale"), 2, (28, 896)
        ) == P(None, "model")


class TestShardedTrainStep:
    def test_sharded_step_matches_single_device(self):
        policy = FastVLAPolicy(FastVLAConfig(**TINY))
        arrays = make_arrays(policy, batch=8)
        mesh = make_mesh(data=4, model=2)

        trainable = policy.trainable_params()
        frozen = policy.frozen_params()
        tx = optax.adamw(1e-3)
        opt_state = tx.init(trainable)

        def step(trainable, opt_state, frozen, arrays):
            grad_fn = jax.value_and_grad(policy.loss_fn, has_aux=True)
            (loss, metrics), grads = grad_fn(trainable, frozen, arrays)
            updates, opt_state = tx.update(grads, opt_state, trainable)
            return optax.apply_updates(trainable, updates), opt_state, metrics

        # single device reference
        ref_trainable, _, ref_metrics = jax.jit(step)(
            trainable, opt_state, frozen, arrays
        )

        # sharded: params per TP rules, batch over data axis
        with mesh:
            sh_frozen = shard_params(mesh, frozen)
            sh_trainable = shard_params(mesh, trainable)
            sh_opt = tx.init(sh_trainable)
            sh_arrays = shard_batch(mesh, arrays)
            out_trainable, _, metrics = jax.jit(step)(
                sh_trainable, sh_opt, sh_frozen, sh_arrays
            )

        assert np.isfinite(float(metrics["loss"]))
        np.testing.assert_allclose(
            float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4
        )
        flat_ref = jax.tree_util.tree_leaves(ref_trainable)
        flat_out = jax.tree_util.tree_leaves(out_trainable)
        for a, b in zip(flat_ref, flat_out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_param_shardings_tree_matches(self):
        policy = FastVLAPolicy(FastVLAConfig(**TINY))
        mesh = make_mesh(data=4, model=2)
        shardings = param_shardings(mesh, policy.params)
        # same tree structure
        jax.tree_util.tree_map(lambda a, b: None, policy.params, shardings)


class TestShardedServing:
    """TP x DP serving path (VERDICT r1 #2): the policy step and KV-cached
    generation run sharded over the mesh and match single-device outputs."""

    def test_sharded_policy_forward_matches_single_device(self):
        from vla_fastvlm_tpu.serving import ActionQueuePolicy, ShardedPolicyRuntime

        policy = FastVLAPolicy(FastVLAConfig(**TINY))
        mesh = make_mesh(data=4, model=2)
        runtime = ShardedPolicyRuntime(policy, mesh)

        rng = np.random.default_rng(1)
        images = rng.random((8, 3, 32, 32), dtype=np.float32)
        states = rng.standard_normal((8, 4)).astype(np.float32)
        tasks = ["move the block"] * 8

        ref = np.asarray(policy.forward(images, states, tasks))
        out = np.asarray(runtime.forward(images, states, tasks))
        np.testing.assert_allclose(out, ref, atol=2e-5)

        # sharded runtime slots into the chunked serving wrapper unchanged
        queue = ActionQueuePolicy(runtime, n_action_steps=1)
        action = queue.select_action(
            {"images": images, "states": states, "tasks": tasks}
        )
        np.testing.assert_allclose(np.asarray(action), ref, atol=2e-5)

    def test_sharded_multicam_chunked_policy(self):
        """Multi-camera observations + action chunking through the sharded
        runtime: (B, ncam, C, H, W) batches shard over data, the chunk head
        emits (B, chunk, A), and the action queue consumes it unchanged."""
        from vla_fastvlm_tpu.serving import ActionQueuePolicy, ShardedPolicyRuntime

        cfg = FastVLAConfig(**{**TINY, "num_cameras": 2, "chunk_size": 2})
        policy = FastVLAPolicy(cfg)
        runtime = ShardedPolicyRuntime(policy, make_mesh(data=4, model=2))
        rng = np.random.default_rng(9)
        images = rng.random((8, 2, 3, 32, 32), dtype=np.float32)
        states = rng.standard_normal((8, 4)).astype(np.float32)
        tasks = ["stack"] * 8

        ref = np.asarray(policy.forward(images, states, tasks))
        out = np.asarray(runtime.forward(images, states, tasks))
        assert out.shape == (8, 2, 4)
        np.testing.assert_allclose(out, ref, atol=2e-5)

        queue = ActionQueuePolicy(runtime, n_action_steps=2)
        batch = {"images": images, "states": states, "tasks": tasks}
        a0 = queue.select_action(batch)
        a1 = queue.select_action(batch)
        np.testing.assert_allclose(np.asarray(a0), ref[:, 0], atol=2e-5)
        np.testing.assert_allclose(np.asarray(a1), ref[:, 1], atol=2e-5)

    def test_batch_not_divisible_by_dp_raises(self):
        from vla_fastvlm_tpu.serving import ShardedPolicyRuntime

        policy = FastVLAPolicy(FastVLAConfig(**TINY))
        runtime = ShardedPolicyRuntime(policy, make_mesh(data=4, model=2))
        rng = np.random.default_rng(2)
        with pytest.raises(ValueError, match="not divisible"):
            runtime.forward(
                rng.random((6, 3, 32, 32), dtype=np.float32),
                rng.standard_normal((6, 4)).astype(np.float32),
                ["t"] * 6,
            )

    def test_sharded_select_action_matches_policy(self):
        from vla_fastvlm_tpu.serving import ShardedPolicyRuntime

        policy = FastVLAPolicy(FastVLAConfig(**TINY))
        runtime = ShardedPolicyRuntime(
            policy, make_mesh(data=1, model=2, devices=jax.devices()[:2])
        )
        rng = np.random.default_rng(5)
        image = rng.random((3, 32, 32), dtype=np.float32)
        state = rng.standard_normal(4).astype(np.float32)
        ref = np.asarray(policy.select_action(image, state, "go"))
        out = np.asarray(runtime.select_action(image, state, "go"))
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_sharded_generate_matches_unsharded(self):
        from vla_fastvlm_tpu.models import FastVLM, fastvlm_tiny
        from vla_fastvlm_tpu.serving import generate, sharded_generate

        cfg = fastvlm_tiny()
        model = FastVLM(cfg)
        ids = jnp.ones((1, 8), jnp.int32)
        imgs = jnp.zeros((1, 3, 64, 64))
        params = model.init(jax.random.PRNGKey(0), imgs, ids)["params"]

        rng = np.random.default_rng(3)
        b, t = 4, 10
        input_ids = jnp.asarray(rng.integers(3, 500, (b, t)), jnp.int32)
        mask = jnp.ones((b, t), jnp.int32)
        images = jnp.asarray(rng.random((b, 3, 64, 64), dtype=np.float32))

        ref = np.asarray(
            generate(model, params, images, input_ids, mask, max_new_tokens=6)
        )
        mesh = make_mesh(data=4, model=2)
        out = np.asarray(
            sharded_generate(
                model, params, images, input_ids, mask, mesh, max_new_tokens=6
            )
        )
        np.testing.assert_array_equal(out, ref)

        # pre-placed params path (reused across calls in a server)
        from vla_fastvlm_tpu.parallel import shard_params

        placed = shard_params(mesh, params)
        out2 = np.asarray(
            sharded_generate(
                model, placed, images, input_ids, mask, mesh,
                max_new_tokens=6, params_are_placed=True,
            )
        )
        np.testing.assert_array_equal(out2, ref)
