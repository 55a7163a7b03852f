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
