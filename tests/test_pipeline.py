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
