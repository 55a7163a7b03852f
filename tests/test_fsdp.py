"""FSDP (ZeRO-3-style) sharding: spec rules, train-step parity, 7B memory.

The reference's only distributed strategy is DDP, which replicates the full
model + optimizer state on every rank (reference ``trainer.py:55,68-78``) —
full-backbone 7B training can never fit a 16 GB chip that way. The TPU-native
answer is GSPMD FSDP: large parameters (and, through sharding inheritance,
their gradients and AdamW moments) are split over the ``data`` mesh axis;
XLA all-gathers each shard at its use site and reduce-scatters the gradient
(``parallel/sharding.py::fsdp_param_shardings``).

Runs on the virtual 8-device CPU mesh (conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from vla_fastvlm_tpu.fastvla import FastVLAConfig, FastVLAPolicy
from vla_fastvlm_tpu.parallel import (
    fsdp_param_shardings,
    fsdp_spec_for_param,
    make_mesh,
    shard_batch,
    shard_params,
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
    train_backbone=True,
    freeze_backbone=False,
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


class TestFsdpSpec:
    def test_extends_unsharded_dim(self):
        # TP already took N: FSDP shards K over data.
        spec = fsdp_spec_for_param(P(None, "model"), (4096, 4096), 8)
        assert spec == P("data", "model")

    def test_replicated_param_shards_largest_dim(self):
        # embedding (vocab, hidden): vocab is largest -> data.
        spec = fsdp_spec_for_param(P(), (152064, 3584), 8)
        assert spec == P("data", None)

    def test_scan_axis_protected(self):
        # scan-stacked decoder kernel (L, K, N): never shard the layer axis.
        spec = fsdp_spec_for_param(P(None, None, "model"), (28, 3584, 3584), 8)
        assert spec == P(None, "data", "model")

    def test_small_param_stays_replicated(self):
        spec = fsdp_spec_for_param(P(), (64,), 8)
        assert spec == P()

    def test_indivisible_dims_unchanged(self):
        spec = fsdp_spec_for_param(P(), (1001, 333), 8, min_elements=0)
        assert spec == P()

    def test_data_size_one_noop(self):
        spec = fsdp_spec_for_param(P(None, "model"), (4096, 4096), 1)
        assert spec == P(None, "model")

    def test_min_elements_override(self):
        spec = fsdp_spec_for_param(P(), (16, 16), 4, min_elements=0)
        assert spec == P("data", None)


class TestFsdpTrainStep:
    def test_fsdp_step_matches_single_device(self):
        """Full-backbone train step under FSDP == the single-device step."""
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

        ref_trainable, _, ref_metrics = jax.jit(step)(
            trainable, opt_state, frozen, arrays
        )

        with mesh:
            # min_elements=0: tiny-model leaves are all below the production
            # threshold; force the FSDP split so the collective path is real.
            sh_trainable = shard_params(
                mesh, trainable, fsdp=True, fsdp_min_elements=0
            )
            sh_frozen = shard_params(mesh, frozen, fsdp=True, fsdp_min_elements=0)
            sh_opt = tx.init(sh_trainable)
            sh_arrays = shard_batch(mesh, arrays)
            out_trainable, out_opt, metrics = jax.jit(step)(
                sh_trainable, sh_opt, sh_frozen, sh_arrays
            )

        # at least one decoder kernel must actually be data-sharded
        specs = [
            leaf.sharding.spec
            for leaf in jax.tree_util.tree_leaves(sh_trainable)
            if getattr(leaf, "ndim", 0) >= 2
        ]
        assert any("data" in [ax for ax in spec if ax] for spec in specs)

        np.testing.assert_allclose(
            float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4
        )
        # Param tolerance is looser than the TP test's: FSDP resharding
        # changes f32 reduction orders everywhere (min_elements=0 shards
        # even the tiny vision convs), and AdamW at step 0 (v ~ 0) turns
        # grad noise into O(lr)-scale update differences. Loss and the
        # 1e-3-lr update direction agree; bitwise equality is not expected.
        for a, b in zip(
            jax.tree_util.tree_leaves(ref_trainable),
            jax.tree_util.tree_leaves(out_trainable),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1.5e-3)

        # optimizer moments inherit the FSDP sharding (the ZeRO memory win)
        m_leaves = [
            leaf
            for leaf in jax.tree_util.tree_leaves(out_opt)
            if getattr(leaf, "ndim", 0) >= 2
        ]
        assert any(
            "data" in [ax for ax in leaf.sharding.spec if ax] for leaf in m_leaves
        )

    def test_trainer_fsdp_config_smoke(self, tmp_path):
        """Trainer(config.fsdp=True) runs a sharded step end to end."""
        from vla_fastvlm_tpu.training import Trainer, TrainingConfig

        policy = FastVLAPolicy(FastVLAConfig(**TINY))
        mesh = make_mesh(data=4, model=2)

        def batches():
            yield {
                "images": np.random.default_rng(1).random(
                    (8, 3, 32, 32), dtype=np.float32
                ),
                "states": np.zeros((8, 4), np.float32),
                "actions": np.zeros((8, 4), np.float32),
                "tasks": ["move"] * 8,
            }

        config = TrainingConfig(
            output_dir=str(tmp_path),
            max_steps=1,
            logging_steps=1,
            eval_steps=1000,
            save_steps=1000,
            report_to=[],
            fsdp=True,
            prefetch_batches=1,
        )
        trainer = Trainer(
            policy, list(batches()), eval_dataloader=None, config=config, mesh=mesh
        )
        trainer.fit()
        assert trainer.global_step == 1
        assert all(
            np.isfinite(np.asarray(leaf)).all()
            for leaf in jax.tree_util.tree_leaves(trainer.trainable)
        )


class TestFsdp7BMemory:
    """The claim FSDP exists to back: full Qwen2-7B *training* state fits
    v5e chips. Analytic per-chip byte budget from the actual shardings, plus
    an AOT compile proving GSPMD accepts the layout and inserts collectives.
    """

    def _abstract_7b(self):
        from vla_fastvlm_tpu.models import Qwen2Model, qwen2_7b

        cfg = qwen2_7b(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
        model = Qwen2Model(cfg)
        params = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
        )["params"]
        return model, params

    def test_per_chip_training_state_fits_v5e(self):
        _, params = self._abstract_7b()
        mesh = make_mesh(data=8, model=1)
        shardings = fsdp_param_shardings(mesh, params)

        def leaf_bytes(leaf, sharding):
            shape = leaf.shape
            spec = sharding.spec
            entries = [None] * (len(shape) - len(spec)) + list(spec)
            denom = 1
            for ax in entries:
                if ax:
                    denom *= int(mesh.shape[ax])
            return int(np.prod(shape)) * leaf.dtype.itemsize / denom

        per_chip_params = sum(
            jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(leaf_bytes, params, shardings)
            )
        )
        replicated = sum(
            int(np.prod(leaf.shape)) * leaf.dtype.itemsize
            for leaf in jax.tree_util.tree_leaves(params)
        )
        # params + grads + AdamW m + v (all bf16, inheriting param shardings)
        per_chip_train_state = per_chip_params * 4
        assert replicated > 14e9  # 7B bf16 really is ~15 GB replicated
        # FSDP must shard at least ~85% of bytes (embeddings+kernels)
        assert per_chip_params < replicated / 6
        # the training-state budget that motivates the feature:
        assert per_chip_train_state < 9e9, per_chip_train_state

    @pytest.mark.slow
    def test_7b_fsdp_train_step_compiles_on_mesh(self):
        model, params = self._abstract_7b()
        mesh = make_mesh(data=8, model=1)
        shardings = fsdp_param_shardings(mesh, params)
        tx = optax.adamw(1e-4)

        abstract_params = jax.tree_util.tree_map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            params,
            shardings,
        )
        abstract_opt = jax.eval_shape(tx.init, abstract_params)
        # moments inherit the param shardings (zeros_like preserves them)
        opt_shardings = jax.tree_util.tree_map(
            lambda s: getattr(s, "sharding", None), abstract_opt
        )
        abstract_opt = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=s.sharding)
            if getattr(s, "sharding", None) is not None
            else s,
            abstract_opt,
        )

        from jax.sharding import NamedSharding

        data_sh = NamedSharding(mesh, P("data"))
        b, t = 8, 16
        ids = jax.ShapeDtypeStruct((b, t), jnp.int32, sharding=data_sh)
        mask = jax.ShapeDtypeStruct((b, t), jnp.int32, sharding=data_sh)

        def train_step(params, opt_state, ids, mask):
            def loss_fn(p):
                hidden, _, _ = model.apply(
                    {"params": p}, input_ids=ids, attention_mask=mask
                )
                return jnp.mean(jnp.square(hidden.astype(jnp.float32)))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        with mesh:
            compiled = (
                jax.jit(
                    train_step,
                    donate_argnums=(0, 1),
                    out_shardings=(shardings, opt_shardings, None),
                )
                .lower(abstract_params, abstract_opt, ids, mask)
                .compile()
            )
        hlo = compiled.as_text()
        assert "all-gather" in hlo or "all-reduce" in hlo
        assert "reduce-scatter" in hlo or "all-reduce" in hlo
