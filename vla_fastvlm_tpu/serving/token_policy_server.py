"""Closed-loop control over the production generation servers.

Bridges the autoregressive action-token policy
(``fastvla/token_policy.py``) onto the continuous-batching serving stack:
every control tick, each environment's observation becomes ONE generation
request — ``[prompt][state tokens]`` prompt, ``action_dim`` new tokens —
submitted to a dense, paged, or speculative-paged server; the emitted
tokens de-bin to the action vector. This is what makes the measured
decode-serving levers (paged KV pools, Pallas paged attention, chunked
prefill, speculative draft-verify — BASELINE.md) carry closed-loop robot
control, which the reference cannot express at all (its serving loop is
one eager forward per env step, reference
``lerobot_fastvla/modeling_fastvla.py:113-125``).

The adapter quacks like a FastVLA policy for ``ActionQueuePolicy`` /
``BatchedEnvRunner`` (``forward(images, states, tasks) -> (B, D)``), so
`scripts/eval_closed_loop.py --action-head token --serving paged|spec-paged`
drives it with the standard runner. Within one control tick all ``B``
requests drain in ``ceil(B / num_slots)`` waves; each wave submits every
free slot BEFORE touching the device, then runs the whole fixed-length
decode tail as ONE scanned program with ONE fetch (``step_n`` — an
action-token request emits exactly ``max_new_tokens`` tokens, eos never
fires), so a wave costs ``ceil(slots/prefill_batch)`` admission programs
plus ONE decode program instead of ``action_dim`` RTT-bound ticks
(VERDICT r4 ask #4; speculative servers keep their own multi-token
rounds). Requests are re-submitted fresh every control tick (KV state has
no value across ticks — the observation changes).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import numpy as np


class TokenPolicyServer:
    """Serve a FastVLMTokenPolicy's control ticks through a generation server.

    ``server``: any of ``GenerationServer`` / ``PagedGenerationServer`` /
    ``SpeculativePagedGenerationServer`` built over the SAME FastVLM model
    and params as ``policy.backbone`` with ``max_new_tokens ==
    policy.config.action_dim`` and ``eos_token_id=-1`` (an action token can
    never terminate a request early).
    """

    def __init__(self, policy, server) -> None:
        self.policy = policy
        self.server = server
        self.config = policy.config
        if server.max_new_tokens != policy.num_action_tokens:
            raise ValueError(
                f"server.max_new_tokens ({server.max_new_tokens}) must equal "
                f"chunk_size * action_dim ({policy.num_action_tokens})"
            )
        if server.eos_token_id >= 0:
            raise ValueError(
                "build the server with eos_token_id=-1: action tokens must "
                "never terminate generation early"
            )
        mcfg = policy.backbone.model_config
        bcfg = policy.backbone.config

        def letterbox(images):
            from ..model.fastvlm_adapter import prepare_policy_images

            return prepare_policy_images(images, mcfg, bcfg)

        self._letterbox = jax.jit(letterbox)
        self._multimodal = mcfg.num_image_tokens > 0
        # A speculative tick already emits up to k+1 tokens per slot; plain
        # servers instead run the whole fixed-length decode tail as ONE
        # scanned program per wave (``step_n`` — the round-4 host-serial
        # tick was ceil(B/slots) x action_dim RTT-bound programs; VERDICT
        # r4 ask #4).
        self._speculative = hasattr(server, "draft")
        self.control_ticks = 0
        self.server_ticks = 0  # logical decode ticks (1/token wave or round)
        self.server_programs = 0  # dispatched decode programs (RTT units)

    def forward(
        self,
        images,
        states,
        tasks: List[str] | str,
        device=None,
    ) -> np.ndarray:
        """One control tick: B observations -> (B, action_dim) actions."""
        del device  # single-chip serving stack
        policy = self.policy
        images = policy.processor.prepare_images(images)
        states = policy.processor.prepare_states(states)
        b = images.shape[0]
        tasks = policy.processor.prepare_tasks(tasks, batch_size=b)
        ids, mask = policy.backbone._prep_text(tasks)
        ids, mask = policy._pack(
            np.asarray(ids), np.asarray(mask),
            policy.tokenizer.encode(np.asarray(states)),
        )
        imgs_host: Optional[np.ndarray] = None
        if self._multimodal:
            if getattr(self.server, "image_prep", None) is not None:
                # The server letterboxes INSIDE its admission programs:
                # submit raw env-resolution frames, so the host boundary
                # carries B small frames per tick — never the tower-size
                # (e.g. 1024px) upscaled batch round-tripped through the
                # tunnel (build the server with image_prep=
                # prepare_policy_images, as scripts/eval_closed_loop.py
                # does).
                imgs_host = np.asarray(images, np.float32)
            else:
                # Fallback: one jitted letterbox over the whole tick's
                # frames, fetched once (the servers take tower-size images).
                imgs_host = np.asarray(
                    self._letterbox(np.asarray(images, np.float32))
                )

        outputs: Dict[int, List[int]] = {}
        rid_to_row: Dict[int, int] = {}
        row = 0
        budget = self.server.max_new_tokens
        while len(outputs) < b:
            # Fill every free slot before touching the device: submit only
            # queues host-side; the next step admits the whole wave in
            # prefill_batch-sized compiled programs.
            while row < b and self.server.has_free_slot():
                rid = self.server.submit(
                    ids[row : row + 1],
                    mask[row : row + 1],
                    imgs_host[row : row + 1]
                    if imgs_host is not None
                    else None,
                )
                rid_to_row[rid] = row
                row += 1
            if self._speculative:
                # Draft-verify rounds emit 1..k+1 tokens per slot per tick.
                outputs.update(self.server.step())
                self.server_ticks += 1
                self.server_programs += 1
            else:
                # The whole wave's decode tail (budget - 1 ticks after the
                # prefill-emitted first token) in ONE program + ONE fetch.
                before = len(outputs)
                outputs.update(self.server.step_n(budget))
                done = len(outputs) - before
                self.server_ticks += budget - 1 if done else 1
                self.server_programs += 1
        self.control_ticks += 1

        d = policy.num_action_tokens
        tokens = np.zeros((b, d), np.int64)
        for rid, toks in outputs.items():
            tokens[rid_to_row[rid]] = np.asarray(toks[:d], np.int64)
        actions = policy.tokenizer.decode(tokens)  # (B, chunk*D) float32
        if policy.config.chunk_size > 1:
            return actions.reshape(
                b, policy.config.chunk_size, policy.config.action_dim
            )
        return actions  # (B, action_dim)

    def reset(self) -> None:
        return
