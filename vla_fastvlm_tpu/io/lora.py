"""LoRA / QLoRA adapters for the Qwen2 decoder — 7B fine-tuning on one chip.

The reference fine-tunes the action head with the backbone hard-frozen
(reference ``fastvlm_adapter.py:501`` wraps the backbone forward in
``@torch.no_grad``); adapting the 7B backbone itself is out of a single
device's reach with full AdamW (~28 GB bf16 weights+grads+moments per
billion params). Low-rank adapters are the TPU-native answer: the frozen
base stays bf16 *or int8/int4* (``io/quantize.py`` — QLoRA-style), and only
rank-r deltas train, so a v5e chip holds a quantized 7B base plus megabytes
of adapters and optimizer state.

Design
------
- Adapters live in a separate Flax variable collection ``"lora"`` — never
  inside ``"params"`` — mounted at apply time:
  ``model.apply({"params": params, "lora": lora}, ...)``. The delta is
  added at each target projection's call site
  (``models/qwen2.py::_lora_delta``): ``y + x @ A @ B``.
- The tree MIRRORS the param tree's module paths, so ``nn.scan``'s stacked
  layers just work: a scanned kernel ``(L, in, out)`` gets ``a: (L, in, r)``
  and ``b: (L, r, out)`` with ``variable_axes={"lora": 0}``.
- **Pre-scaled convention**: the standard LoRA forward scale ``alpha/rank``
  folds into A's init std (``A ~ N(0, (alpha/rank)/sqrt(fan_in))``,
  ``B = 0``), so the forward needs no runtime scalar and ``merge_lora`` is
  exactly ``W + A @ B``. B starting at zero makes the adapted model
  bit-identical to the base at step 0 (test-pinned).
- Quantized bases compose: ``init_lora`` reads fan-in/out from the stored
  int8/int4 ``kernel`` (same logical shape as float), and the delta adds to
  the projection *output*, after the quantized matmul. Merging into a
  quantized base is refused (re-quantize from a merged float checkpoint
  instead).
"""

from __future__ import annotations

import zlib
from typing import Dict, FrozenSet, Iterable

import jax
import jax.numpy as jnp
import numpy as np

# The seven Qwen2 decoder projections (attention + MLP). The embedding,
# norms, vision tower, projector, and action head are not LoRA targets —
# the small ones train fully via the existing trainable/frozen split.
DEFAULT_LORA_TARGETS: FrozenSet[str] = frozenset(
    {
        "q_proj",
        "k_proj",
        "v_proj",
        "o_proj",
        "gate_proj",
        "up_proj",
        "down_proj",
    }
)


def init_lora(
    params: Dict,
    rank: int,
    rng: jax.Array,
    alpha: float | None = None,
    targets: Iterable[str] = DEFAULT_LORA_TARGETS,
    dtype=jnp.float32,
) -> Dict:
    """Build a ``"lora"`` collection tree for ``params``' target kernels.

    Walks the param tree; every dict node named in ``targets`` that holds a
    ``kernel`` leaf (float, int8, or packed-int4 — all keep the logical
    ``(..., fan_in, fan_out)`` shape) gets ``{"a", "b"}`` with matching
    leading (scan) axes. ``alpha`` defaults to ``rank`` (unit scale).
    """
    if rank <= 0:
        raise ValueError(f"rank must be positive, got {rank}")
    alpha = float(rank) if alpha is None else float(alpha)
    targets = frozenset(targets)

    def walk(node, path):
        if not isinstance(node, dict):
            return None
        out = {}
        for key, child in node.items():
            if (
                key in targets
                and isinstance(child, dict)
                and "kernel" in child
            ):
                kshape = child["kernel"].shape
                lead, fan_in, fan_out = kshape[:-2], kshape[-2], kshape[-1]
                site_rng = jax.random.fold_in(
                    rng, zlib.crc32("/".join(path + (key,)).encode())
                )
                std = (alpha / rank) / np.sqrt(fan_in)
                out[key] = {
                    "a": (
                        jax.random.normal(
                            site_rng, lead + (fan_in, rank), dtype
                        )
                        * std
                    ),
                    "b": jnp.zeros(lead + (rank, fan_out), dtype),
                }
            else:
                sub = walk(child, path + (key,))
                if sub:
                    out[key] = sub
        return out

    tree = walk(params, ())
    if not tree:
        raise ValueError(
            f"no LoRA targets {sorted(targets)} with kernels found in params"
        )
    return tree


def merge_lora(params: Dict, lora: Dict) -> Dict:
    """Fold adapters into a float base: every mounted site's kernel becomes
    ``W + A @ B`` (pre-scaled convention — no extra scalar). Returns a new
    tree; refuses quantized kernels (re-quantize a merged float checkpoint
    instead — the low-rank delta cannot be added to int codes exactly)."""

    def walk(pnode, lnode):
        if not isinstance(lnode, dict):
            return pnode
        out = dict(pnode)
        for key, lchild in lnode.items():
            pchild = pnode[key]
            if "a" in lchild and "b" in lchild and "kernel" in pchild:
                kernel = pchild["kernel"]
                if not jnp.issubdtype(kernel.dtype, jnp.floating):
                    raise TypeError(
                        f"cannot merge LoRA into quantized kernel "
                        f"({kernel.dtype}) at {key!r}; merge into the float "
                        "checkpoint and re-quantize"
                    )
                delta = jnp.einsum(
                    "...ir,...ro->...io", lchild["a"], lchild["b"]
                )
                merged = dict(pchild)
                merged["kernel"] = (
                    kernel.astype(jnp.float32) + delta.astype(jnp.float32)
                ).astype(kernel.dtype)
                out[key] = merged
            else:
                out[key] = walk(pchild, lchild)
        return out

    return walk(params, lora)


def lora_num_params(lora: Dict) -> int:
    return int(
        sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(lora))
    )


def load_lora(checkpoint_dir) -> Dict:
    """Extract the trained ``"lora"`` adapter tree from a policy checkpoint.

    Training with ``lora_rank > 0`` saves the adapters inside the policy
    checkpoint (``FastVLMWithExpert.params`` carries the ``"lora"`` subtree
    through ``io/checkpoint.save_policy_checkpoint``). This pulls just the
    adapter tree back out — megabytes, not the base — for serving
    (``GenerationServer(lora=...)`` / ``scripts/serve.py --lora-dir``) or
    ``merge_lora``."""
    from .checkpoint import load_policy_state

    _, params = load_policy_state(checkpoint_dir)
    if "lora" not in params:
        raise ValueError(
            f"checkpoint {checkpoint_dir} has no 'lora' adapters (was it "
            "trained with lora_rank > 0?)"
        )
    return params["lora"]


def stack_loras(adapters, include_base: bool = True) -> Dict:
    """Stack adapter trees for multi-LoRA serving (one base, many tenants).

    ``[lora, ...] -> stacked`` where every site's ``a``/``b`` gains an
    adapter axis placed *after* any scan (layer) axis — so ``nn.scan``'s
    ``variable_axes={"lora": 0}`` still slices layers and each layer sees
    ``(N, fan_in, r)``. ``include_base=True`` prepends an all-zeros adapter
    at index 0 (exactly no delta), so servers can route un-adapted requests
    through the same compiled program. Pair with ``lora_with_ids`` to select
    an adapter per batch row. No reference counterpart (the reference has no
    adapters at all); this is the vLLM-style multi-adapter serving shape.
    """
    adapters = list(adapters)
    if not adapters:
        raise ValueError("stack_loras needs at least one adapter")
    treedef = jax.tree_util.tree_structure(adapters[0])
    for tree in adapters[1:]:
        if jax.tree_util.tree_structure(tree) != treedef:
            raise ValueError(
                "all adapters must share one structure (same rank/targets "
                "on the same base model)"
            )

    def stack(*leaves):
        axis = leaves[0].ndim - 2  # after the scan axis, before (fan, r)
        if include_base:
            leaves = (jnp.zeros_like(leaves[0]),) + tuple(leaves)
        return jnp.stack(leaves, axis=axis)

    return jax.tree_util.tree_map(stack, *adapters)


def lora_with_ids(stacked: Dict, ids) -> Dict:
    """Mount per-row adapter indices onto a ``stack_loras`` tree.

    Every site gains an ``"ids"`` leaf that ``models/qwen2._lora_delta``
    gathers its row's adapter by: ``y[b] += x[b] @ A[ids[b]] @ B[ids[b]]``.
    ``ids``: (B,) int32, indexing the stacked adapter axis (0 = the zeros
    base adapter when stacked with ``include_base=True``). Scanned sites
    (``a.ndim == 4``: (L, N, fan_in, r)) carry ids tiled to (L, B) so the
    scan's ``variable_axes={"lora": 0}`` hands each layer (B,) — the tile is
    bytes, not a copy of the adapters. Rebuilding this tree per serving tick
    is host-dict work only; the stacked a/b device buffers are shared.
    """
    ids = jnp.asarray(ids, jnp.int32)
    if ids.ndim != 1:
        raise ValueError(f"ids must be (B,), got shape {ids.shape}")

    def walk(node):
        out = {}
        for key, child in node.items():
            if isinstance(child, dict) and "a" in child and "b" in child:
                a = child["a"]
                site_ids = (
                    jnp.broadcast_to(ids, (a.shape[0], ids.shape[0]))
                    if a.ndim == 4
                    else ids
                )
                out[key] = {"a": child["a"], "b": child["b"], "ids": site_ids}
            else:
                out[key] = walk(child)
        return out

    return walk(stacked)
