"""torch <-> JAX bridge for the LeRobot plugin.

LeRobot is a PyTorch ecosystem: its trainer owns a torch optimizer and calls
``loss.backward()`` (SURVEY.md §3.3). The TPU policy is JAX. The bridge keeps
the *trainable* parameters (the action-expert head — the backbone is frozen
and stop-gradient'd, matching the reference semantics) as torch Parameters
that LeRobot's AdamW updates, and routes the loss through a
``torch.autograd.Function`` whose forward runs the jitted JAX loss+grad on
TPU and whose backward hands the JAX gradients to torch autograd.

The data marshaled per step is only the head parameters (a few MB) and the
batch — the multi-hundred-MB backbone stays resident on TPU. This keeps the
torch-boundary copy cost out of the per-step critical path, the SURVEY.md
§7.3 concern.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax
import numpy as np

from ..io.checkpoint import flatten_params, unflatten_params


def head_to_torch(head_params: Dict) -> "Dict[str, object]":
    """Flax head param tree -> {dotted_name: torch.nn.Parameter}."""
    import torch

    flat = flatten_params(jax.device_get(head_params))
    return {
        name: torch.nn.Parameter(torch.from_numpy(np.asarray(value).copy()))
        for name, value in flat.items()
    }


def torch_to_head(named_params: Dict[str, "object"]) -> Dict:
    """{dotted_name: torch tensor} -> flax head param tree (numpy leaves)."""
    return unflatten_params(
        {
            name: param.detach().cpu().numpy()
            for name, param in named_params.items()
        }
    )


def make_torch_loss(
    value_and_grad_fn: Callable[[Dict, Dict[str, np.ndarray]], Tuple[float, Dict]],
    param_names: List[str],
):
    """Build a torch-autograd-compatible loss callable.

    ``value_and_grad_fn(head_tree, arrays) -> (loss_scalar, grad_tree)`` is
    the jitted JAX computation; ``param_names`` fixes the flattening order of
    the torch parameters.
    """
    import torch

    class _JaxLoss(torch.autograd.Function):
        @staticmethod
        def forward(ctx, arrays, *flat_params):
            head_tree = unflatten_params(
                {
                    name: p.detach().cpu().numpy()
                    for name, p in zip(param_names, flat_params)
                }
            )
            loss, grads = value_and_grad_fn(head_tree, arrays)
            flat_grads = flatten_params(jax.device_get(grads))
            ctx.saved_grads = [
                torch.from_numpy(np.asarray(flat_grads[name]).copy())
                for name in param_names
            ]
            return torch.tensor(float(loss), dtype=torch.float32)

        @staticmethod
        def backward(ctx, upstream):
            return (None, *[upstream * g for g in ctx.saved_grads])

    def loss_fn(arrays: Dict[str, np.ndarray], flat_params: List["object"]):
        return _JaxLoss.apply(arrays, *flat_params)

    return loss_fn
