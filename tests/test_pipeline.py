"""Pipeline-parallel decoder forward == unsharded forward (GPipe/shard_map)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_fastvlm_tpu.models.qwen2 import Qwen2Model, qwen2_tiny
from vla_fastvlm_tpu.parallel.pipeline import make_pipe_mesh, pipeline_forward


@pytest.fixture(scope="module")
def model_and_params():
    cfg = qwen2_tiny().replace(num_hidden_layers=4)
    model = Qwen2Model(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), input_ids=ids)["params"]
    return model, params


class TestPipelineForward:
    @pytest.mark.parametrize("stages,n_micro", [(2, 2), (4, 2), (2, 4), (1, 2)])
    def test_matches_unsharded(self, model_and_params, stages, n_micro):
        model, params = model_and_params
        rng = np.random.default_rng(0)
        b, t = 4, 10
        ids = jnp.asarray(rng.integers(3, 500, (b, t)), jnp.int32)
        mask = np.ones((b, t), np.int32)
        mask[2, 6:] = 0  # ragged row
        mask = jnp.asarray(mask)

        ref, _, _ = model.apply(
            {"params": params}, input_ids=ids, attention_mask=mask
        )
        out = pipeline_forward(
            model, params, ids, mask,
            make_pipe_mesh(stages), n_microbatches=n_micro,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5,
            err_msg=f"stages={stages} micro={n_micro}",
        )

    def test_guards(self, model_and_params):
        model, params = model_and_params
        ids = jnp.ones((4, 8), jnp.int32)
        with pytest.raises(ValueError, match="not divisible"):
            pipeline_forward(model, params, ids, None, make_pipe_mesh(3))
        with pytest.raises(ValueError, match="microbatches"):
            pipeline_forward(
                model, params, ids, None, make_pipe_mesh(2), n_microbatches=3
            )


class TestPipelineTraining:
    """GPipe training: jax.grad through the pipelined forward (shard_map
    transposes ppermute/psum), with remat activation stashing."""

    @pytest.mark.parametrize("remat", [False, True])
    def test_grads_match_unpipelined(self, model_and_params, remat):
        model, params = model_and_params
        rng = np.random.default_rng(1)
        b, t, h = 4, 8, model.cfg.hidden_size
        ids = jnp.asarray(rng.integers(3, 500, (b, t)), jnp.int32)
        mask = jnp.ones((b, t), jnp.int32)
        targets = jnp.asarray(rng.standard_normal((b, t, h)), jnp.float32)

        def ref_loss(p):
            hidden, _, _ = model.apply(
                {"params": p}, input_ids=ids, attention_mask=mask
            )
            return jnp.mean(jnp.square(hidden - targets))

        def pp_loss(p):
            hidden = pipeline_forward(
                model, p, ids, mask, make_pipe_mesh(2),
                n_microbatches=2, remat=remat,
            )
            return jnp.mean(jnp.square(hidden - targets))

        ref_val, ref_grads = jax.value_and_grad(ref_loss)(params)
        # remat's closed_call inside shard_map requires jit (as in the real
        # train step); harmless for the non-remat variant.
        pp_val, pp_grads = jax.jit(jax.value_and_grad(pp_loss))(params)
        np.testing.assert_allclose(float(pp_val), float(ref_val), rtol=1e-5)
        flat_ref = jax.tree_util.tree_leaves_with_path(ref_grads)
        flat_pp = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(pp_grads)
        )
        for key, ref_leaf in flat_ref:
            name = jax.tree_util.keystr(key)
            np.testing.assert_allclose(
                np.asarray(flat_pp[name]), np.asarray(ref_leaf),
                atol=5e-5, rtol=1e-3, err_msg=name,
            )

    def test_train_step_decreases_loss(self, model_and_params):
        import optax

        from vla_fastvlm_tpu.parallel import make_pipeline_train_step

        model, params = model_and_params
        rng = np.random.default_rng(2)
        b, t, h = 4, 8, model.cfg.hidden_size
        ids = jnp.asarray(rng.integers(3, 500, (b, t)), jnp.int32)
        mask = jnp.ones((b, t), jnp.int32)
        targets = jnp.asarray(rng.standard_normal((b, t, h)) * 0.1, jnp.float32)

        mesh = make_pipe_mesh(2)
        tx = optax.adam(1e-2)
        step, place = make_pipeline_train_step(model, tx, mesh, n_microbatches=2)
        params = place(params)
        opt_state = tx.init(params)
        losses = []
        for _ in range(5):
            params, opt_state, loss = step(params, opt_state, ids, mask, targets)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses
        assert np.isfinite(losses).all()
