"""Discrete action/state tokenization for autoregressive VLA decoding.

No reference counterpart: the reference's policies regress continuous
actions through an MLP head on pooled features (reference
``src/vla_fastvlm/fastvla/fastvlm_with_expert.py:23-38``). The token head
family (RT-2 / OpenVLA lineage; see also Fast-dVLA in PAPERS.md) instead
discretizes each action dimension into uniform bins, maps bins onto the
TAIL of the language model's vocabulary (OpenVLA overwrites the
least-used tokens the same way), and decodes actions **autoregressively
through the VLM's own lm_head**. That is what makes the whole
decode-serving stack built in rounds 2-4 — paged KV pools, prefix caching,
continuous batching, speculative draft-verify — applicable to closed-loop
robot control: each control tick becomes a short generation instead of a
pooled regression.

Robot state rides the same codebook: each state dimension becomes one
token appended after the instruction, so the policy needs **no extra
parameters at all** — fine-tuning is LoRA/QLoRA or full-backbone, and the
serving path is byte-identical to text generation.

Binning follows the RT-2 convention: clip to ``[low, high]``, uniform
bins, decode to bin centers. The quantization error is bounded by half a
bin: ``(high - low) / (2 * num_bins)`` per dimension.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class ActionTokenizer:
    """Uniform-bin value <-> vocab-tail token codec.

    ``vocab_size`` is the language model's vocab; bins occupy ids
    ``[vocab_size - num_bins, vocab_size)`` so every emitted token is a
    valid lm_head index and greedy decoding over the full vocabulary can
    in principle emit non-action tokens — ``decode`` clips such strays to
    the nearest bin (OpenVLA behaves the same way).
    """

    vocab_size: int
    num_bins: int = 256
    low: float = -1.0
    high: float = 1.0

    def __post_init__(self):
        if self.num_bins < 2:
            raise ValueError(f"num_bins must be >= 2, got {self.num_bins}")
        if self.num_bins > self.vocab_size:
            raise ValueError(
                f"num_bins {self.num_bins} exceeds vocab {self.vocab_size}"
            )
        if not self.high > self.low:
            raise ValueError(f"need high > low, got [{self.low}, {self.high}]")

    @property
    def base_id(self) -> int:
        return self.vocab_size - self.num_bins

    @property
    def bin_width(self) -> float:
        return (self.high - self.low) / self.num_bins

    # numpy (host-side batch prep / server output decoding) ---------------

    def encode(self, values) -> np.ndarray:
        """(..., D) float values -> (..., D) int32 token ids."""
        x = np.clip(np.asarray(values, np.float32), self.low, self.high)
        b = np.floor((x - self.low) / self.bin_width).astype(np.int64)
        b = np.clip(b, 0, self.num_bins - 1)
        return (self.base_id + b).astype(np.int32)

    def decode(self, tokens) -> np.ndarray:
        """(..., D) token ids -> (..., D) float32 bin centers.

        Ids outside the codebook clip to the nearest bin."""
        b = np.clip(np.asarray(tokens, np.int64) - self.base_id, 0,
                    self.num_bins - 1).astype(np.float32)
        return (self.low + (b + 0.5) * self.bin_width).astype(np.float32)

    # jnp (inside jitted programs) ----------------------------------------

    def decode_jnp(self, tokens):
        import jax.numpy as jnp

        b = jnp.clip(
            tokens.astype(jnp.int32) - self.base_id, 0, self.num_bins - 1
        ).astype(jnp.float32)
        return self.low + (b + 0.5) * self.bin_width
