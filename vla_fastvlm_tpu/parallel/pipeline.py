"""Pipeline parallelism (GPipe) for the Qwen2 decoder stack.

SURVEY.md §2.3 marks PP optional (nothing in the reference is pipelined);
this module provides the working seam: the decoder's scanned layer stack is
split over a ``pipe`` mesh axis, microbatches flow stage-to-stage via
``jax.lax.ppermute`` inside ``shard_map``, and the classic GPipe schedule
(n_micro + P - 1 ticks) fills/drains the bubble. Embeddings, RoPE tables,
masks, and the final norm stay replicated outside the pipelined region.

Design notes (TPU-first):
- Stage-local compute reuses the model's own scanned ``Qwen2Block`` with the
  stacked layer parameters sliced along the layer axis by shard_map — the
  parameter tree is untouched, so any checkpoint loads directly.
- ``ppermute`` rides the ICI ring; at tick t, stage p computes microbatch
  (t - p) and hands its activation to stage p+1.
- The final stage's outputs are broadcast back with a masked ``psum`` so the
  caller sees a replicated (B, T, H) array.

Training-time PP: the schedule is differentiable end to end — shard_map
transposes ``ppermute`` into the reverse ring permute and the masked ``psum``
into a broadcast, so ``jax.grad`` through ``pipeline_forward`` IS the GPipe
backward (forward all microbatches, then backward all, with stage-to-stage
activation-cotangent ppermutes). ``remat=True`` checkpoints each stage-tick
so stashed activations are recomputed in the backward instead of stored —
the classic GPipe memory trade. ``pipeline_train_step`` packages loss, grads
(stage-local for the layer stack), and an optax update into one jitted
program; gradient parity with the unpipelined graph is pinned by
``tests/test_pipeline.py``. A 1F1B interleave is a scheduling refinement XLA
cannot express without manual backward staging; GPipe-with-remat is the
JAX-idiomatic equivalent at these depths.
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
def _shard_map(f, mesh, in_specs, out_specs):
    """jax.shard_map across API generations (check_vma vs check_rep)."""
    if hasattr(jax, "shard_map"):
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    from jax.experimental.shard_map import shard_map as legacy

    return legacy(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.qwen2 import Qwen2Block, Qwen2Config, Qwen2Model
from ..ops.rope import rope_cos_sin

PIPE_AXIS = "pipe"


def make_pipe_mesh(stages: int, devices=None) -> Mesh:
    """1D ``pipe`` mesh over ``stages`` devices."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())[:stages]
    if len(devices) != stages:
        raise ValueError(f"need {stages} devices for {stages} pipeline stages")
    return Mesh(np.array(devices), (PIPE_AXIS,))


def _run_local_layers(cfg: Qwen2Config, layer_params, x, kv_mask, cos, sin,
                      local_layers: int):
    """Apply this stage's slice of the scanned decoder blocks."""
    scanned = nn.scan(
        Qwen2Block,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        in_axes=(nn.broadcast, nn.broadcast, nn.broadcast,
                 nn.broadcast, 0, 0, 0, 0, nn.broadcast),
        out_axes=0,
        length=local_layers,
    )
    y, _ = scanned(cfg, True).apply(
        {"params": layer_params}, x, None, kv_mask, cos, sin,
        None, None, None, None, None
    )
    return y


def _place_layers(layers, mesh: Mesh):
    """Place the stacked layer params with the layer axis over ``pipe``.

    ``device_put`` onto an identical sharding is a no-op, so already-placed
    trees (e.g. via ``make_pipeline_train_step``'s ``place``) pass through.
    """
    return jax.device_put(
        layers,
        jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P(PIPE_AXIS)), layers
        ),
    )


def pipeline_forward(
    model: Qwen2Model,
    params,
    input_ids: jnp.ndarray,  # (B, T)
    attention_mask: jnp.ndarray | None,
    mesh: Mesh,
    n_microbatches: int = 2,
    remat: bool = False,
) -> jnp.ndarray:
    """Full-causal decoder forward, layer stack pipelined over ``pipe``.

    Returns the post-final-norm hidden states — identical to
    ``model.apply(...)[0]`` (pinned by ``tests/test_pipeline.py``).
    """
    cfg = model.cfg
    if not cfg.scan_layers:
        raise ValueError("pipeline_forward requires scan_layers=True")
    stages = int(mesh.shape[PIPE_AXIS])
    if cfg.num_hidden_layers % stages:
        raise ValueError(
            f"{cfg.num_hidden_layers} layers not divisible by {stages} stages"
        )
    local_layers = cfg.num_hidden_layers // stages

    b, t = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((b, t), jnp.int32)
    if b % n_microbatches:
        raise ValueError(f"batch {b} not divisible by {n_microbatches} microbatches")
    mb = b // n_microbatches

    # Replicated pre/post stages: embed + RoPE tables outside the pipe.
    x = model.apply(
        {"params": params}, input_ids, method=Qwen2Model.embed
    ).astype(cfg.dtype)
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None, :], (b, t))
    cos, sin = rope_cos_sin(positions, cfg.resolved_head_dim, cfg.rope_theta, cfg.dtype)

    def micro(arr):  # (B, ...) -> (n_micro, mb, ...)
        return arr.reshape((n_microbatches, mb) + arr.shape[1:])

    x_m, mask_m = micro(x), micro(attention_mask)
    cos_m, sin_m = micro(cos), micro(sin)

    run_layers = _run_local_layers
    if remat:
        # GPipe activation stashing: recompute each stage-tick's internals
        # in the backward instead of storing per-layer residuals.
        run_layers = jax.checkpoint(
            _run_local_layers, static_argnums=(0, 6), prevent_cse=False
        )

    def stage_fn(layers, x_m, mask_m, cos_m, sin_m):
        p = jax.lax.axis_index(PIPE_AXIS)
        carry = jnp.zeros_like(x_m[0])
        outputs = jnp.zeros_like(x_m)
        n_ticks = n_microbatches + stages - 1
        for tick in range(n_ticks):
            # stage p works on microbatch (tick - p); out-of-range ticks run
            # on clamped (ignored) data to keep the program static.
            mb_idx = jnp.clip(tick - p, 0, n_microbatches - 1)
            inject = jnp.take(x_m, mb_idx, axis=0)
            inp = jnp.where(p == 0, inject, carry)
            out = run_layers(
                cfg, layers, inp,
                jnp.take(mask_m, mb_idx, axis=0),
                jnp.take(cos_m, mb_idx, axis=0),
                jnp.take(sin_m, mb_idx, axis=0),
                local_layers,
            )
            if stages > 1:
                carry = jax.lax.ppermute(
                    out, PIPE_AXIS, [(i, i + 1) for i in range(stages - 1)]
                )
            out_idx = tick - (stages - 1)
            if 0 <= out_idx < n_microbatches:
                keep = jnp.where(p == stages - 1, out, jnp.zeros_like(out))
                outputs = outputs.at[out_idx].set(keep)
        # broadcast the last stage's results to every device
        return jax.lax.psum(outputs, PIPE_AXIS)

    layer_specs = jax.tree_util.tree_map(
        lambda _: P(PIPE_AXIS), params["layers"]
    )
    pipelined = _shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(layer_specs, P(), P(), P(), P()),
        out_specs=P(),
    )
    y = pipelined(_place_layers(params["layers"], mesh), x_m, mask_m, cos_m, sin_m)
    y = y.reshape((b, t) + y.shape[3:])

    from ..ops.norms import rms_norm

    return rms_norm(y, params["norm"]["weight"], cfg.rms_norm_eps)


def make_pipeline_train_step(
    model: Qwen2Model,
    tx,
    mesh: Mesh,
    n_microbatches: int = 2,
    loss_fn=None,
    remat: bool = True,
):
    """Jitted GPipe training step: (params, opt_state, ids, mask, targets).

    ``loss_fn(hidden, targets) -> scalar`` defaults to MSE over the hidden
    states (the FastVLA head loss shape; swap in an LM cross-entropy for text
    pretraining). Gradients flow through the pipelined stack — stage-local
    for the layer params, replicated for embed/norm — and ``tx`` (optax)
    applies the update in the same program. Returns ``(step, place)`` where
    ``place(params)`` puts the layer stack on the pipe mesh once up front.
    """
    if loss_fn is None:
        def loss_fn(hidden, targets):
            return jnp.mean(jnp.square(hidden - targets.astype(hidden.dtype)))

    def scalar_loss(params, input_ids, attention_mask, targets):
        hidden = pipeline_forward(
            model, params, input_ids, attention_mask, mesh,
            n_microbatches=n_microbatches, remat=remat,
        )
        return loss_fn(hidden, targets)

    def place(params):
        return {**params, "layers": _place_layers(params["layers"], mesh)}

    @jax.jit
    def step(params, opt_state, input_ids, attention_mask, targets):
        loss, grads = jax.value_and_grad(scalar_loss)(
            params, input_ids, attention_mask, targets
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), opt_state, loss

    return step, place
