"""Sharding rules: parameter/batch PartitionSpecs for the FastVLA stack.

GSPMD-style: annotate shardings, let XLA insert the collectives (all-gather
for TP-sharded matmul inputs, reduce-scatter/all-reduce for outputs and DP
gradients) over ICI. This replaces the reference's NCCL DDP all-reduce
(reference ``trainer.py:175``) and adds the TP dimension the reference lacks
(SURVEY.md §2.3: Qwen2-7B bf16 ~14GB does not fit one v5e chip with
activations/KV, so the 7B path requires model-axis sharding).

TP layout for Qwen2 (Megatron-style column/row split, expressed as specs):
- q/k/v/gate/up projections: output-feature dim on ``model`` (column).
- o_proj/down projection: input-feature dim on ``model`` (row) — XLA emits
  the psum at the block boundary.
- embeddings, norms, action head: replicated (small).
With ``nn.scan`` the decoder params carry a leading layer axis, handled by
rank-aware spec padding.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

# (path-suffix, spec on the trailing dims) — specs are right-aligned against
# the param rank so the scan-stacked leading layer axis stays unsharded.
_TP_RULES: tuple[tuple[tuple[str, ...], P], ...] = (
    (("self_attn", "q_proj", "kernel"), P(None, MODEL_AXIS)),
    (("self_attn", "q_proj", "bias"), P(MODEL_AXIS)),
    (("self_attn", "k_proj", "kernel"), P(None, MODEL_AXIS)),
    (("self_attn", "k_proj", "bias"), P(MODEL_AXIS)),
    (("self_attn", "v_proj", "kernel"), P(None, MODEL_AXIS)),
    (("self_attn", "v_proj", "bias"), P(MODEL_AXIS)),
    (("self_attn", "o_proj", "kernel"), P(MODEL_AXIS, None)),
    (("mlp", "gate_proj", "kernel"), P(None, MODEL_AXIS)),
    (("mlp", "up_proj", "kernel"), P(None, MODEL_AXIS)),
    (("mlp", "down_proj", "kernel"), P(MODEL_AXIS, None)),
    (("lm_head", "kernel"), P(None, MODEL_AXIS)),
    # Weight-only int8 scales (io/quantize.py): per-output-column (..., 1, N),
    # so they follow their kernel's OUTPUT split — column-split kernels shard
    # scales on model, row-split kernels (o_proj/down_proj) keep per-output
    # scales replicated (the default rule).
    (("self_attn", "q_proj", "scale"), P(None, MODEL_AXIS)),
    (("self_attn", "k_proj", "scale"), P(None, MODEL_AXIS)),
    (("self_attn", "v_proj", "scale"), P(None, MODEL_AXIS)),
    (("mlp", "gate_proj", "scale"), P(None, MODEL_AXIS)),
    (("mlp", "up_proj", "scale"), P(None, MODEL_AXIS)),
    (("lm_head", "scale"), P(None, MODEL_AXIS)),
)


def _path_names(path) -> tuple[str, ...]:
    names = []
    for entry in path:
        if isinstance(entry, jax.tree_util.DictKey):
            names.append(str(entry.key))
        else:
            names.append(str(getattr(entry, "key", getattr(entry, "idx", entry))))
    return tuple(names)


def spec_for_param(
    path_names: tuple[str, ...],
    ndim: int,
    shape: tuple = (),
    model_size: int | None = None,
) -> P:
    """PartitionSpec for one parameter, right-aligned to its rank.

    ``shape`` disambiguates the one shape-dependent case: row-split kernels'
    (o_proj/down_proj) ``scale`` leaves. int8 scales are per-output-column
    ``(..., 1, N)`` and replicate; int4 group scales are ``(..., K/G, N)``
    whose group axis must follow the kernel's contraction split —
    *when it divides* the model-axis size (``model_size``; 7B's 28 groups
    over TP=4 do). An indivisible group count (0.5B's K=896 -> 7 groups
    over TP=2) replicates the scale instead: GSPMD then all-gathers that
    kernel at its grouped reshape, trading o_proj/down_proj row-locality
    for correctness at non-multiple-of-(G*tp) hidden sizes. Production 7B
    shapes divide cleanly; callers without a mesh keep the sharded spec.
    """
    if (
        path_names[-1:] == ("scale",)
        and path_names[-2:-1] in (("o_proj",), ("down_proj",))
        and len(shape) >= 2
        and shape[-2] > 1
    ):
        pad = ndim - 2
        if pad >= 0 and (model_size is None or shape[-2] % model_size == 0):
            return P(*([None] * pad + [MODEL_AXIS, None]))
        if pad >= 0:
            return P()
    for suffix, spec in _TP_RULES:
        if path_names[-len(suffix):] == suffix:
            pad = ndim - len(spec)
            if pad < 0:
                return P()
            return P(*([None] * pad + list(spec)))
    return P()  # replicate


def param_shardings(mesh: Mesh, params: Dict) -> Dict:
    """Pytree of NamedShardings matching ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh,
            spec_for_param(
                _path_names(path),
                getattr(leaf, "ndim", 0),
                tuple(getattr(leaf, "shape", ())),
                model_size=int(mesh.shape.get(MODEL_AXIS, 1)),
            ),
        ),
        params,
    )


# FSDP (ZeRO-3-style fully sharded data parallelism): params below this
# element count stay replicated — sharding tiny leaves buys no memory and
# costs a collective per use.
FSDP_MIN_ELEMENTS = 2**16


def fsdp_spec_for_param(
    spec: P,
    shape: tuple,
    data_size: int,
    min_elements: int | None = None,
) -> P:
    """Extend a parameter's TP spec with a ``data``-axis shard (FSDP).

    Shards the *largest* dim the TP rules left unsharded, provided it
    divides the data-axis size. GSPMD then all-gathers the parameter at its
    use site and reduce-scatters its gradient — memory for params, grads,
    and optimizer state drops by |data| while the math stays identical to
    DP. This is the piece the reference cannot express at all (its DDP
    replicates the full model per rank, reference ``trainer.py:68-78``);
    it is what makes FULL-backbone Qwen2-7B training fit v5e-16GB chips
    (see tests/test_fsdp.py's AOT memory budget).

    The scan-stacked leading layer axis of the decoder (rank>=3 leaves) is
    never sharded: ``lax.scan`` slices one layer per step, and keeping the
    layer axis unsharded keeps each slice a pure chip-local view (the
    standard JAX LLM layout — shard features, not the stack).
    """
    if min_elements is None:
        min_elements = FSDP_MIN_ELEMENTS
    size = 1
    for d in shape:
        size *= int(d)
    if data_size <= 1 or size < min_elements:
        return spec
    ndim = len(shape)
    entries = [None] * (ndim - len(spec)) + list(spec)
    start = 1 if ndim >= 3 else 0  # protect the scan/stack axis
    best = None
    for i in range(start, ndim):
        if entries[i] is not None:
            continue
        if shape[i] % data_size != 0:
            continue
        if best is None or shape[i] > shape[best]:
            best = i
    if best is None:
        return spec
    entries[best] = DATA_AXIS
    return P(*entries)


def fsdp_param_shardings(
    mesh: Mesh, params: Dict, min_elements: int | None = None
) -> Dict:
    """Pytree of NamedShardings: TP rules + data-axis FSDP extension."""
    model_size = int(mesh.shape.get(MODEL_AXIS, 1))
    data_size = int(mesh.shape.get(DATA_AXIS, 1))

    def one(path, leaf):
        names = _path_names(path)
        shape = tuple(getattr(leaf, "shape", ()))
        spec = spec_for_param(
            names, getattr(leaf, "ndim", 0), shape, model_size=model_size
        )
        return NamedSharding(
            mesh, fsdp_spec_for_param(spec, shape, data_size, min_elements)
        )

    return jax.tree_util.tree_map_with_path(one, params)


def batch_spec() -> P:
    """Batch arrays: leading dim over ``data``."""
    return P(DATA_AXIS)


def batch_shardings(mesh: Mesh, arrays: Dict[str, Any]) -> Dict[str, Any]:
    return {
        key: NamedSharding(mesh, P(DATA_AXIS) if getattr(v, "ndim", 0) > 0 else P())
        for key, v in arrays.items()
    }


def shard_params(
    mesh: Mesh,
    params: Dict,
    fsdp: bool = False,
    fsdp_min_elements: int | None = None,
) -> Dict:
    """Place a parameter pytree onto the mesh per the TP rules.

    ``fsdp=True`` additionally shards every large leaf over the ``data``
    axis (``fsdp_param_shardings``) — ZeRO-3-style memory scaling for
    full-backbone training.

    int4 leaves on TPU meshes route through ``device.stage_int4`` (jax 0.9
    cannot relayout an s4 array — ``device.py``'s layout-staging note): host
    int4 leaves stage as int8 nibbles placed under the mesh sharding and
    cast on device into the canonical packed Format; already-placed device
    s4 leaves (canonical format by invariant) repack in place, which
    requires their device to be inside the mesh (always true for meshes
    built over the default device set). CPU meshes (the virtual-mesh tests)
    have no tiled layouts and pass through plain ``device_put``.
    """
    import jax.numpy as jnp

    if fsdp:
        shardings = fsdp_param_shardings(mesh, params, fsdp_min_elements)
    else:
        shardings = param_shardings(mesh, params)
    if not any(d.platform == "tpu" for d in mesh.devices.flat):
        return jax.device_put(params, shardings)
    from ..device import stage_int4

    def put(leaf, sharding):
        if getattr(leaf, "dtype", None) == jnp.int4:
            return stage_int4(leaf, sharding)
        return jax.device_put(leaf, sharding)

    return jax.tree_util.tree_map(put, params, shardings)


def cache_shardings(mesh: Mesh, cache: Dict[str, Any]) -> Dict[str, Any]:
    """NamedShardings for a KV cache pytree (``models/qwen2.init_kv_cache``).

    K/V buffers are (L, B, S, K_heads, D): batch over ``data`` (DP), kv heads
    over ``model`` (TP) — matching the head split the TP rules give the
    q/k/v projections, so cached keys/values live on the chip that computes
    that head's attention and decode needs no cache collectives. The mask
    (B, S) and per-example cursor (B,) follow the batch axis.
    """
    specs = {
        "k": P(None, DATA_AXIS, None, MODEL_AXIS, None),
        "v": P(None, DATA_AXIS, None, MODEL_AXIS, None),
        # int8-cache scales (L, B, S, K): follow their buffer's batch/head
        # split so quantize-at-write and dequantize-at-read stay chip-local.
        "k_scale": P(None, DATA_AXIS, None, MODEL_AXIS),
        "v_scale": P(None, DATA_AXIS, None, MODEL_AXIS),
        "mask": P(DATA_AXIS, None),
        "index": P(DATA_AXIS),
    }
    return {key: NamedSharding(mesh, specs[key]) for key in cache}


def shard_cache(mesh: Mesh, cache: Dict[str, Any]) -> Dict[str, Any]:
    """Place a KV cache onto the mesh (batch over data, kv heads over model)."""
    shardings = cache_shardings(mesh, cache)
    return {key: jax.device_put(value, shardings[key]) for key, value in cache.items()}


def shard_batch(mesh: Mesh, arrays: Dict[str, Any]) -> Dict[str, Any]:
    """Place batch arrays with the leading dim split over ``data``."""
    return {
        key: jax.device_put(
            value,
            NamedSharding(mesh, P(DATA_AXIS) if getattr(value, "ndim", 0) > 0 else P()),
        )
        for key, value in arrays.items()
    }
