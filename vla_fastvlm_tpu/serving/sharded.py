"""TP/DP-sharded inference and serving.

The reference's serving hot loop is one VLM forward per env step on a single
device (``lerobot_fastvla/modeling_fastvla.py:113-125``). FastVLM-7B bf16
(~14 GB parameters) does not fit a single v5e chip once activations and KV
cache are counted (SURVEY.md §2.3), so the flagship serving configuration of
BASELINE.json — 7B inference on v5e-8 — requires the policy step itself to be
sharded. This module provides that:

- ``ShardedPolicyRuntime``: a drop-in ``forward``-compatible wrapper around
  ``FastVLAPolicy`` whose parameters live TP-sharded (Megatron-style specs
  from ``parallel/sharding.py``) and whose batch is DP-split over the mesh's
  ``data`` axis. Plugs into ``ActionQueuePolicy``/``BatchedEnvRunner``
  unchanged.
- ``sharded_generate``: KV-cached generation with the cache model-sharded
  over kv heads (decode reads/writes stay chip-local; the only TP
  collectives are the per-block all-reduces GSPMD inserts after the
  row-parallel projections).

All sharding is GSPMD: parameters/batch/cache are *placed* with
NamedShardings and the jitted programs are ordinary ``jax.jit`` — XLA
propagates the layout through the model and inserts ICI collectives.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.fastvlm import FastVLM
from ..parallel.mesh import DATA_AXIS
from ..parallel.sharding import (
    cache_shardings,
    shard_batch,
    shard_cache,
    shard_params,
)
from .generate import build_cache


class ShardedPolicyRuntime:
    """Mesh-sharded FastVLA policy step (TP params x DP batch).

    Exposes the serving surface ``ActionQueuePolicy`` consumes (``config``,
    ``forward(images, states, tasks)``) so chunked queueing and batched env
    stepping compose with sharding. The policy's parameters are placed once
    at construction; every ``forward`` shards the incoming batch over
    ``data`` and runs the same jitted program.
    """

    def __init__(self, policy, mesh: Mesh) -> None:
        self.policy = policy
        self.config = policy.config
        self.mesh = mesh
        self.data_size = int(mesh.shape[DATA_AXIS])
        self.params = shard_params(mesh, policy.params)
        # Replicate the action output: every host-side consumer (env runner,
        # action queue) reads the full batch.
        out_sharding = NamedSharding(mesh, P())
        self._step = jax.jit(policy.model.apply_fn, out_shardings=out_sharding)

    def forward(
        self,
        images,
        states,
        tasks: List[str] | str,
        device=None,
    ) -> jax.Array:
        """Batch observations -> actions, computed sharded over the mesh."""
        proc = self.policy.processor
        images = proc.prepare_images(images)
        states = proc.prepare_states(states)
        if images.shape[0] % self.data_size:
            raise ValueError(
                f"batch {images.shape[0]} not divisible by data-parallel "
                f"size {self.data_size}"
            )
        tasks = proc.prepare_tasks(tasks, batch_size=images.shape[0])
        ids, mask = self.policy.model.backbone._prep_text(tasks)
        arrays = shard_batch(
            self.mesh,
            {
                "images": images,
                "states": states,
                "input_ids": np.asarray(ids),
                "attention_mask": np.asarray(mask),
            },
        )
        return self._step(
            self.params,
            arrays["images"],
            arrays["input_ids"],
            arrays["attention_mask"],
            arrays["states"],
        )

    def select_action(self, image, state, task: str, device=None) -> jax.Array:
        action = self.forward(
            np.asarray(image, dtype=np.float32)[None],
            np.asarray(state, dtype=np.float32)[None],
            task,
        )
        return action[0]

    def reset(self) -> None:
        return


@partial(
    jax.jit,
    static_argnums=(0,),
    static_argnames=("max_new_tokens", "temperature", "top_p", "eos_token_id"),
    # The caller-provided cache is consumed: donating it lets XLA alias the
    # (L, B, S, K, D) buffers instead of allocating a second cache-sized
    # block for the scan carry (ROADMAP: donated serving buffers).
    donate_argnums=(5,),
)
def _generate_with_cache(
    model: FastVLM,
    params,
    images,
    input_ids,
    attention_mask,
    cache,
    *,
    max_new_tokens: int,
    eos_token_id: int,
    temperature: float,
    top_p: float,
    rng,
    lora=None,
):
    """Prefill + scanned decode against a caller-provided (placed) cache."""
    variables = {"params": params}
    if lora is not None:
        variables["lora"] = lora
    last_logits, _, cache, _, _ = model.apply(
        variables, images, input_ids, attention_mask, cache,
        method=FastVLM.prefill,
    )

    from .sampling import sample_tokens

    def sample(logits, key):
        return sample_tokens(logits, key, temperature, top_p)

    rng, key0 = jax.random.split(rng)
    token0 = sample(last_logits, key0).astype(jnp.int32)
    done0 = token0 == eos_token_id

    def step(carry, key):
        token, done, cache = carry
        logits, cache = model.apply(
            variables, token[:, None], cache,
            method=FastVLM.decode_step,
        )
        next_token = sample(logits, key).astype(jnp.int32)
        next_token = jnp.where(done, eos_token_id, next_token)
        done = jnp.logical_or(done, next_token == eos_token_id)
        return (next_token, done, cache), token

    keys = jax.random.split(rng, max_new_tokens)
    (_, _, _), tokens = jax.lax.scan(step, (token0, done0, cache), keys)
    return tokens.T


def sharded_generate(
    model: FastVLM,
    params,
    images: Optional[jnp.ndarray],
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    mesh: Mesh,
    *,
    max_new_tokens: int = 32,
    eos_token_id: int = 2,
    temperature: float = 0.0,
    top_p: float = 1.0,
    rng: Optional[jax.Array] = None,
    params_are_placed: bool = False,
    lora=None,
) -> jnp.ndarray:
    """Mesh-sharded greedy/temperature generation.

    Parameters are TP-sharded, the batch DP-split, and the KV cache sharded
    (L, B@data, S, K@model, D) so decode-step cache updates are chip-local.
    Pass ``params_are_placed=True`` when ``params`` were already placed with
    ``shard_params`` (e.g. reused across calls). ``lora``: optional adapter
    tree (``io/lora.py``; single or ``lora_with_ids``-mounted multi) —
    replicated on the mesh; GSPMD re-partitions the rank-r deltas against
    the TP-sharded projections.
    """
    if not params_are_placed:
        params = shard_params(mesh, params)
    if lora is not None:
        lora = jax.device_put(lora, NamedSharding(mesh, P()))
    b, t = input_ids.shape
    cache = shard_cache(
        mesh, build_cache(model.cfg, b, t, max_new_tokens)
    )
    arrays = shard_batch(
        mesh,
        {
            "input_ids": jnp.asarray(input_ids),
            "attention_mask": jnp.asarray(attention_mask),
            **({"images": images} if images is not None else {}),
        },
    )
    return _generate_with_cache(
        model,
        params,
        arrays.get("images"),
        arrays["input_ids"],
        arrays["attention_mask"],
        cache,
        max_new_tokens=max_new_tokens,
        eos_token_id=eos_token_id,
        temperature=temperature,
        top_p=top_p,
        rng=rng if rng is not None else jax.random.PRNGKey(0),
        lora=lora,
    )


__all__ = [
    "ShardedPolicyRuntime",
    "sharded_generate",
    "cache_shardings",
]
