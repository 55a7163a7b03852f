"""Action expert heads: pooled VLM features + robot state -> actions.

Flax re-implementation of the reference's head stack, which is identical in
both policy generations (legacy ``model/policy.py:34-49`` and current
``fastvla/fastvlm_with_expert.py:23-38``):

    state_projection = LayerNorm -> Linear(state_dim -> hidden) -> SiLU
    fusion           = Linear(feat+hidden -> fusion) -> LayerNorm -> SiLU
                       -> Dropout -> Linear(fusion -> fusion) -> SiLU
    action_head      = Linear(fusion -> action_dim)

Also provides ``ActionChunkHead``, a chunked variant producing
``(B, chunk, action_dim)`` for action-chunking policies (the LeRobot plugin's
``predict_action_chunk`` surface, reference
``lerobot_fastvla/modeling_fastvla.py:113-117``, generalized beyond chunk=1).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class ActionExpertHead(nn.Module):
    state_dim: int
    action_dim: int
    hidden_dim: int = 1024
    fusion_dim: int = 1024
    dropout: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,  # (B, H_feat) pooled backbone features
        states: jnp.ndarray,  # (B, state_dim)
        deterministic: bool = True,
    ) -> jnp.ndarray:  # (B, action_dim)
        dense = lambda feats, name: nn.Dense(
            feats, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        norm = lambda name: nn.LayerNorm(
            dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )

        s = norm("state_norm")(states.astype(self.dtype))
        s = nn.silu(dense(self.hidden_dim, "state_proj")(s))

        fused = jnp.concatenate([features.astype(self.dtype), s], axis=-1)
        fused = dense(self.fusion_dim, "fusion_fc1")(fused)
        fused = nn.silu(norm("fusion_norm")(fused))
        fused = nn.Dropout(self.dropout, deterministic=deterministic)(fused)
        fused = nn.silu(dense(self.fusion_dim, "fusion_fc2")(fused))

        return dense(self.action_dim, "action_head")(fused)


class ActionChunkHead(nn.Module):
    """Chunked action head: one forward emits ``chunk_size`` future actions.

    Same trunk as ``ActionExpertHead``; the final projection is widened to
    ``chunk_size * action_dim`` and reshaped. With ``chunk_size=1`` this is
    numerically the same family as the reference head.
    """

    state_dim: int
    action_dim: int
    chunk_size: int = 1
    hidden_dim: int = 1024
    fusion_dim: int = 1024
    dropout: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,
        states: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:  # (B, chunk_size, action_dim)
        trunk = ActionExpertHead(
            state_dim=self.state_dim,
            action_dim=self.chunk_size * self.action_dim,
            hidden_dim=self.hidden_dim,
            fusion_dim=self.fusion_dim,
            dropout=self.dropout,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="trunk",
        )
        flat = trunk(features, states, deterministic=deterministic)
        return flat.reshape(flat.shape[0], self.chunk_size, self.action_dim)
