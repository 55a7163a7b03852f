"""Pallas flash-attention kernel numerics vs the XLA reference path.

Runs the kernel in interpreter mode on CPU (``pltpu.force_tpu_interpret_mode``)
so the exact same kernel code that executes on TPU is validated here.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vla_fastvlm_tpu.ops.attention import attention, make_attention_bias, dot_product_attention
from vla_fastvlm_tpu.ops.pallas.flash_attention import (
    _xla_reference,
    flash_attention,
    supports_flash,
)


def rand_qkv(rng, b, t, s, n, kh, d):
    q = jnp.asarray(rng.standard_normal((b, t, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, kh, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, kh, d)), jnp.float32)
    return q, k, v


CASES = [
    # (b, t, s, n, kh, d, causal)
    (1, 16, 16, 2, 2, 64, True),
    (2, 32, 32, 4, 2, 64, True),   # GQA
    (1, 24, 24, 2, 1, 64, False),  # non-causal (vision-style)
    (2, 17, 17, 2, 2, 64, True),   # non-multiple of block
]


@pytest.mark.parametrize("case", CASES)
def test_kernel_matches_reference(case):
    b, t, s, n, kh, d, causal = case
    rng = np.random.default_rng(0)
    q, k, v = rand_qkv(rng, b, t, s, n, kh, d)
    mask = np.ones((b, s), np.int32)
    mask[:, -3:] = 0  # padded keys

    ref = _xla_reference(q, k, v, jnp.asarray(mask), causal, d**-0.5)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, jnp.asarray(mask), causal, None, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_reference_path_matches_bias_path():
    # _xla_reference (flash VJP path) == make_attention_bias + dpa (model path)
    rng = np.random.default_rng(1)
    q, k, v = rand_qkv(rng, 2, 8, 8, 4, 2, 16)
    mask = jnp.asarray(np.array([[1] * 6 + [0] * 2, [1] * 8]), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(8)[None], (2, 8)).astype(jnp.int32)
    bias = make_attention_bias(positions, positions, mask, causal=True)
    a = dot_product_attention(q, k, v, bias=bias)
    b_ = _xla_reference(q, k, v, mask, True, 16**-0.5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-6)


def test_gradients_flow():
    rng = np.random.default_rng(2)
    q, k, v = rand_qkv(rng, 1, 8, 8, 2, 2, 64)
    mask = jnp.ones((1, 8), jnp.int32)

    def loss(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention(q, k, v, mask, True, None, 8)
        return jnp.sum(out**2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_reference(q, k, v, mask, True, 64**-0.5) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestDispatch:
    def test_supports_flash_rules(self):
        assert not supports_flash((1, 8, 4, 64), (1, 8, 2, 64), backend="cpu")
        assert supports_flash((1, 8, 4, 64), (1, 8, 2, 64), backend="tpu")
        assert not supports_flash((1, 8, 4, 32), (1, 8, 2, 32), backend="tpu")
        assert not supports_flash((1, 8, 3, 64), (1, 8, 2, 64), backend="tpu")

    def test_attention_entry_cpu_path(self):
        rng = np.random.default_rng(3)
        q, k, v = rand_qkv(rng, 1, 8, 8, 2, 2, 64)
        mask = jnp.ones((1, 8), jnp.int32)
        out = attention(q, k, v, kv_mask=mask, causal=True, impl="auto")
        ref = _xla_reference(q, k, v, mask, True, 64**-0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
