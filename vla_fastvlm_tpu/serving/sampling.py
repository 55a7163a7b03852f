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


def warp_logits(
    logits: jnp.ndarray,  # (..., V)
    temperature: float,
    top_p: float = 1.0,
) -> jnp.ndarray:
    """Apply the sampling warp (temperature scale + nucleus filter) only.

    Returns fp32 logits whose softmax IS the sampling distribution — the
    quantity speculative rejection sampling needs on both the draft and the
    target side (``serving/speculative.py``): acceptance tests and the
    residual distribution must use exactly the warped distributions tokens
    are drawn from, or the emitted stream stops matching plain sampling.
    ``temperature`` must be > 0 (greedy has no distribution to warp).
    """
    if temperature <= 0.0:
        raise ValueError("warp_logits requires temperature > 0")
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
    return logits


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
    logits = warp_logits(logits, temperature, top_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def speculative_accept(
    draft_tokens: jnp.ndarray,  # (B, k) proposals sampled from the draft
    draft_logits: jnp.ndarray,  # (B, k, V) raw draft logits they came from
    target_logits: jnp.ndarray,  # (B, k+1, V) raw target verify logits
    key: jax.Array,
    temperature: float,
    top_p: float = 1.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rejection-sampling acceptance (Leviathan et al. speculative sampling).

    Returns ``(a, correction)``: ``a`` (B,) is the accepted-prefix length in
    ``[0, k]``, ``correction`` (B,) the extra token each row emits after its
    accepted prefix. Proposal ``i`` is accepted with probability
    ``min(1, p_i(d_i) / q_i(d_i))`` where ``p``/``q`` are the WARPED
    (temperature + top-p) target/draft distributions; on first rejection the
    correction resamples from the residual ``max(p_a - q_a, 0)``
    (renormalized), and on full acceptance it samples the target's own
    ``p_k`` (expressed uniformly here by padding ``q`` with a zeros row) —
    the emitted stream is distributed EXACTLY like plain sampling from the
    target (pinned statistically in ``tests/test_speculative.py``).
    """
    b, k = draft_tokens.shape
    p = jax.nn.softmax(warp_logits(target_logits, temperature, top_p), axis=-1)
    q = jax.nn.softmax(warp_logits(draft_logits, temperature, top_p), axis=-1)

    accept_key, resample_key = jax.random.split(key)
    p_at_d = jnp.take_along_axis(p[:, :k], draft_tokens[..., None], axis=-1)[..., 0]
    q_at_d = jnp.take_along_axis(q, draft_tokens[..., None], axis=-1)[..., 0]
    u = jax.random.uniform(accept_key, (b, k), jnp.float32)
    # u < p/q, written q-multiplied so q ~ 0 (never sampled) stays safe.
    accept = (u * q_at_d < p_at_d).astype(jnp.int32)
    a = jnp.cumprod(accept, axis=1).sum(axis=1)  # (B,) in [0, k]

    # Residual at the first rejected position; q padded with zeros at k so
    # full acceptance reduces to sampling p_k itself.
    q_pad = jnp.concatenate([q, jnp.zeros_like(q[:, :1])], axis=1)
    p_a = jnp.take_along_axis(p, a[:, None, None], axis=1)[:, 0]  # (B, V)
    q_a = jnp.take_along_axis(q_pad, a[:, None, None], axis=1)[:, 0]
    res = jnp.maximum(p_a - q_a, 0.0)
    total = res.sum(axis=-1, keepdims=True)
    # Degenerate guard (p <= q everywhere is measure-zero but bf16 can
    # collapse the difference): fall back to the target distribution.
    res = jnp.where(total > 0, res, p_a)
    res_logits = jnp.where(res > 0, jnp.log(res), -jnp.inf)
    correction = jax.random.categorical(resample_key, res_logits, axis=-1)
    return a, correction.astype(jnp.int32)
