"""Closed-loop serving runtime: action queues + batched env stepping.

This is the §3.3 serving hot loop of the reference (SURVEY.md): LeRobot's
rollout calls ``select_action`` per env step; with ``chunk_size=1`` every call
is a full VLM forward (reference ``lerobot_fastvla/modeling_fastvla.py:113-125``).
The TPU runtime keeps those semantics but:

- the entire policy step (letterbox -> encode -> prefill -> pool -> head) is
  one jitted program, reused across steps (no retrace: static shapes);
- envs are stepped **batched** — one program invocation serves B parallel
  envs, amortizing dispatch and filling the MXU;
- action chunking (``chunk_size > 1``) turns one VLM forward into
  ``n_action_steps`` env steps via the action queue, cutting VLM invocations
  by that factor.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np


class ActionQueuePolicy:
    """Queue-based chunked serving wrapper around a FastVLA policy.

    Semantics parity with the LeRobot plugin policy (reference
    ``lerobot_fastvla/modeling_fastvla.py:78-125``): ``select_action`` pops
    one action per call; when the queue is empty it runs
    ``predict_action_chunk`` and enqueues the first ``n_action_steps``
    actions (time-major).
    """

    def __init__(self, policy, n_action_steps: int = 1) -> None:
        chunk = getattr(policy.config, "chunk_size", 1)
        if n_action_steps > chunk:
            raise ValueError(
                "n_action_steps must be <= chunk_size. "
                f"Got n_action_steps={n_action_steps}, chunk_size={chunk}."
            )
        self.policy = policy
        self.n_action_steps = n_action_steps
        self.reset()

    def reset(self) -> None:
        self._action_queue: deque = deque([], maxlen=self.n_action_steps)

    def predict_action_chunk(self, batch: Dict[str, Any]) -> np.ndarray:
        """(B, chunk, action_dim) actions for one observation batch."""
        actions = self.policy.forward(
            batch["images"], batch["states"], batch.get("tasks", [""])
        )
        actions = np.asarray(jax.device_get(actions), dtype=np.float32)
        if actions.ndim == 2:  # chunk_size == 1 policies emit (B, D)
            actions = actions[:, None, :]
        return actions

    def select_action(self, batch: Dict[str, Any]) -> np.ndarray:
        """(B, action_dim): next action, refilling the queue when empty."""
        if len(self._action_queue) == 0:
            chunk = self.predict_action_chunk(batch)[:, : self.n_action_steps]
            # time-major: queue entries are (B, D) per future step
            self._action_queue.extend(np.moveaxis(chunk, 1, 0))
        return self._action_queue.popleft()


class BatchedEnvRunner:
    """Drive B gym-style envs with one batched policy.

    Env protocol: ``reset() -> obs``, ``step(action) -> (obs, reward, done,
    info)`` where obs is a dict with ``image`` (C, H, W) float and ``state``
    (D,) float. This replaces per-env sequential rollouts with one policy
    invocation per control tick across all envs — the batched closed-loop
    serving configuration of BASELINE.json config #5.
    """

    def __init__(
        self,
        envs: Sequence[Any],
        policy: ActionQueuePolicy,
        task: str | List[str] = "",
    ) -> None:
        self.envs = list(envs)
        self.policy = policy
        b = len(self.envs)
        self.tasks = [task] * b if isinstance(task, str) else list(task)
        assert len(self.tasks) == b

    def _collect_obs(self, obs_list) -> Dict[str, np.ndarray]:
        images = np.stack([np.asarray(o["image"], dtype=np.float32) for o in obs_list])
        states = np.stack([np.asarray(o["state"], dtype=np.float32) for o in obs_list])
        return {"images": images, "states": states, "tasks": self.tasks}

    def run(
        self,
        max_steps: int,
        on_step: Optional[Any] = None,
    ) -> Dict[str, np.ndarray]:
        """Roll out all envs for up to ``max_steps`` control ticks.

        Returns per-env episode returns and lengths; finished envs keep
        receiving (ignored) actions so batch shape stays static for jit.
        """
        b = len(self.envs)
        obs = [env.reset() for env in self.envs]
        returns = np.zeros(b, np.float64)
        lengths = np.zeros(b, np.int64)
        done = np.zeros(b, bool)
        self.policy.reset()

        for _ in range(max_steps):
            batch = self._collect_obs(obs)
            actions = self.policy.select_action(batch)
            for i, env in enumerate(self.envs):
                if done[i]:
                    continue
                obs_i, reward, env_done, _ = env.step(np.asarray(actions[i]))
                obs[i] = obs_i
                returns[i] += float(reward)
                lengths[i] += 1
                done[i] = bool(env_done)
            if on_step is not None:
                on_step(actions, done)
            if done.all():
                break
        return {"returns": returns, "lengths": lengths, "done": done}
