"""torch<->JAX bridge tests (LeRobot plugin core, lerobot-free).

The plugin itself needs the ``lerobot`` package (absent here); the gradient
bridge — the part with real correctness risk — is tested standalone: torch
AdamW must be able to optimize the JAX head through the autograd Function.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vla_fastvlm_tpu.io.checkpoint import flatten_params
from vla_fastvlm_tpu.lerobot_fastvla.torch_bridge import (
    head_to_torch,
    make_torch_loss,
    torch_to_head,
)


def test_roundtrip():
    tree = {"a": {"w": np.ones((2, 3), np.float32)}, "b": np.zeros(4, np.float32)}
    named = head_to_torch(tree)
    assert set(named) == {"a.w", "b"}
    back = torch_to_head(named)
    np.testing.assert_array_equal(back["a"]["w"], tree["a"]["w"])


def test_plugin_symbols_require_lerobot():
    import vla_fastvlm_tpu.lerobot_fastvla as plugin

    if plugin._HAS_LEROBOT:
        pytest.skip("lerobot installed; plugin symbols available")
    with pytest.raises(ImportError, match="lerobot"):
        plugin.FastVLAPolicy  # noqa: B018


def test_torch_optimizer_trains_jax_loss():
    """AdamW over torch mirrors minimizes a JAX quadratic via the bridge."""
    target = jnp.asarray(np.random.default_rng(0).standard_normal((3, 2)),
                         jnp.float32)
    init_tree = {"w": np.zeros((3, 2), np.float32)}

    @jax.jit
    def loss_and_grad(head_tree, arrays):
        def f(tree):
            return jnp.mean(jnp.square(tree["w"] - target))

        loss, grads = jax.value_and_grad(f)(head_tree)
        return loss, grads

    def value_and_grad(head_tree, arrays):
        loss, grads = loss_and_grad(head_tree, arrays)
        return float(loss), grads

    named = head_to_torch(init_tree)
    param_names = sorted(flatten_params(init_tree))
    loss_fn = make_torch_loss(value_and_grad, param_names)
    params = [named[n] for n in param_names]
    opt = torch.optim.AdamW(params, lr=0.1)

    losses = []
    for _ in range(50):
        opt.zero_grad()
        loss = loss_fn({}, params)
        loss.backward()
        opt.step()
        losses.append(float(loss))

    assert losses[-1] < losses[0] * 0.05
    final = torch_to_head({n: named[n] for n in param_names})
    np.testing.assert_allclose(final["w"], np.asarray(target), atol=0.15)


def test_gradient_scaling_respects_upstream():
    """backward must scale JAX grads by the upstream gradient."""
    init_tree = {"w": np.asarray([2.0], np.float32)}

    def value_and_grad(head_tree, arrays):
        def f(tree):
            return jnp.sum(tree["w"] ** 2)

        loss, grads = jax.value_and_grad(f)(
            jax.tree_util.tree_map(jnp.asarray, head_tree)
        )
        return float(loss), grads

    named = head_to_torch(init_tree)
    loss_fn = make_torch_loss(value_and_grad, ["w"])
    p = named["w"]
    loss = loss_fn({}, [p])
    (3.0 * loss).backward()
    # d(3 * w^2)/dw at w=2 -> 12
    np.testing.assert_allclose(p.grad.numpy(), [12.0], rtol=1e-5)
