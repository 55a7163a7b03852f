"""Token sampling for the generation paths (greedy / temperature / top-p).

The reference never generates text (its policy only pools hidden states,
reference ``fastvlm_adapter.py:551-560``), so sampling policy is TPU-build
surface: one jit-safe helper shared by ``generate``, ``sharded_generate``,
and both continuous-batching servers. All branches are resolved at trace
time (temperature/top_p are Python floats), so each configuration compiles
to a single static program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_tokens(
    logits: jnp.ndarray,  # (..., V)
    key: jax.Array | None,
    temperature: float = 0.0,
    top_p: float = 1.0,
) -> jnp.ndarray:
    """(..., V) logits -> (...,) int32 token ids.

    ``temperature <= 0`` is greedy argmax (no key needed). ``top_p < 1``
    applies nucleus filtering: the smallest prefix of the descending-sorted
    distribution with cumulative probability >= top_p stays, everything else
    is masked (the top-1 token always survives).
    """
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if key is None:
        raise ValueError("temperature sampling requires a PRNG key")
    logits = logits.astype(jnp.float32) / temperature
    if top_p < 1.0:
        sorted_logits = jnp.flip(jnp.sort(logits, axis=-1), axis=-1)
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        # Index of the first sorted position whose cumulative mass reaches
        # top_p; tokens with logits below that position's logit are dropped.
        cutoff_idx = jnp.minimum(
            jnp.sum(cum < top_p, axis=-1, keepdims=True),
            logits.shape[-1] - 1,
        )
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
