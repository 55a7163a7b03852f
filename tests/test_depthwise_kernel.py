"""Pallas depthwise conv kernel numerics vs lax.conv (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vla_fastvlm_tpu.ops.pallas.depthwise import depthwise_conv, supports_pallas_dw


def reference(x, w, b, activate):
    c = x.shape[-1]
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    return jax.nn.gelu(out) if activate else out


CASES = [
    # (B, H, W, C, k, activate)
    (1, 16, 16, 128, 3, False),
    (2, 8, 8, 128, 7, True),
    (1, 16, 8, 256, 3, False),  # multiple channel blocks
    (1, 32, 16, 128, 7, False),  # multiple row blocks
]


@pytest.mark.parametrize("case", CASES)
def test_matches_lax_conv(case):
    b, h, w_sp, c, k, act = case
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w_sp, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, 1, c)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)

    ref = reference(x, w, bias, act)
    with pltpu.force_tpu_interpret_mode():
        out = depthwise_conv(x, w, bias, activate=act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_supports_rules():
    assert not supports_pallas_dw((1, 16, 16, 128), 3, backend="cpu")
    assert supports_pallas_dw((1, 16, 16, 128), 3, backend="tpu")
    assert not supports_pallas_dw((1, 16, 16, 96), 3, backend="tpu")  # C % 128
    assert not supports_pallas_dw((1, 17, 16, 128), 3, backend="tpu")  # H % hb
