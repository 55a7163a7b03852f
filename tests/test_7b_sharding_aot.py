"""AOT compile-check of the 7B TP path on the virtual 8-device mesh.

Qwen2-7B cannot be materialized here (no weights, little RAM), but
``jit(...).lower(abstract).compile()`` validates the full TP/DP sharding
layout — partition specs consistent with 7B shapes, collectives inserted,
program compiles — without allocating a single parameter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding

from vla_fastvlm_tpu.models import Qwen2Model, qwen2_7b
from vla_fastvlm_tpu.parallel import (
    batch_spec,
    make_mesh,
    param_shardings,
    spec_for_param,
)


@pytest.mark.slow
def test_7b_decoder_tp_compiles_on_mesh():
    mesh = make_mesh(data=2, model=4)
    cfg = qwen2_7b(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    model = Qwen2Model(cfg)

    b, t = 8, 64
    ids = jax.ShapeDtypeStruct((b, t), jnp.int32)
    mask = jax.ShapeDtypeStruct((b, t), jnp.int32)

    # abstract params via eval_shape: no memory allocated
    params_shape = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4), jnp.int32))
    )["params"]

    shardings = param_shardings(mesh, params_shape)
    # sanity: 7B qkv kernel is sharded over model axis and divisible
    qk = params_shape["layers"]["self_attn"]["q_proj"]["kernel"]
    assert qk.shape == (28, 3584, 3584)
    assert spec_for_param(("layers", "self_attn", "q_proj", "kernel"), 3)[-1] == "model"
    assert qk.shape[-1] % 4 == 0  # divisible by model axis

    def forward(params, ids, mask):
        hidden, _, _ = model.apply(
            {"params": params}, input_ids=ids, attention_mask=mask
        )
        return hidden

    abstract_params = jax.tree_util.tree_map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        params_shape,
        shardings,
    )
    data_sharding = NamedSharding(mesh, batch_spec())
    ids = jax.ShapeDtypeStruct((b, t), jnp.int32, sharding=data_sharding)
    mask = jax.ShapeDtypeStruct((b, t), jnp.int32, sharding=data_sharding)

    with mesh:
        lowered = jax.jit(forward).lower(abstract_params, ids, mask)
        compiled = lowered.compile()

    # The compiled program must contain cross-device collectives (TP all-
    # reduce after row-parallel projections).
    hlo = compiled.as_text()
    assert "all-reduce" in hlo or "all-gather" in hlo or "reduce-scatter" in hlo

    # Per-device parameter bytes must fit a v5e chip (16 GB):
    total = sum(
        np.prod(s.shape) * 2 for s in jax.tree_util.tree_leaves(params_shape)
    )
    per_device_model_shard = total / 4  # model axis 4
    assert per_device_model_shard < 8e9, per_device_model_shard
