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

    def dispatch_chunk(self, batch: Dict[str, Any]):
        """Start one policy forward WITHOUT fetching the result.

        JAX dispatch is asynchronous: the returned device array is a future.
        The staggered runner uses this to overlap device compute with host
        env stepping of other groups; pair with ``fetch_chunk``.
        """
        return self.policy.forward(
            batch["images"], batch["states"], batch.get("tasks", [""])
        )

    @staticmethod
    def fetch_chunk(pending) -> np.ndarray:
        """Await a ``dispatch_chunk`` result -> (B, chunk, action_dim)."""
        actions = np.asarray(jax.device_get(pending), dtype=np.float32)
        if actions.ndim == 2:  # chunk_size == 1 policies emit (B, D)
            actions = actions[:, None, :]
        return actions

    def predict_action_chunk(self, batch: Dict[str, Any]) -> np.ndarray:
        """(B, chunk, action_dim) actions for one observation batch."""
        return self.fetch_chunk(self.dispatch_chunk(batch))

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

    def _collect_obs(self, obs_list, ids=None) -> Dict[str, np.ndarray]:
        if ids is None:
            ids = range(len(obs_list))
        images = np.stack(
            [np.asarray(obs_list[i]["image"], dtype=np.float32) for i in ids]
        )
        states = np.stack(
            [np.asarray(obs_list[i]["state"], dtype=np.float32) for i in ids]
        )
        return {
            "images": images,
            "states": states,
            "tasks": [self.tasks[i] for i in ids],
        }

    def run(
        self,
        max_steps: int,
        on_step: Optional[Any] = None,
        stagger: int = 1,
    ) -> Dict[str, np.ndarray]:
        """Roll out all envs for up to ``max_steps`` control ticks.

        Returns per-env episode returns and lengths; finished envs keep
        receiving (ignored) actions so batch shape stays static for jit.

        ``stagger > 1`` splits the envs into that many groups and software-
        pipelines them: group g's policy forward is *dispatched* (async) and
        fetched only after the host has stepped the other groups' envs — the
        chip computes while the host simulates, hiding env/step + observation
        staging time behind device time (measured decomposition in
        BASELINE.md config #5: those were ~2 s of a 4.5 s serial tick at 7B).
        Closed-loop semantics are unchanged — each group's actions are still
        computed from its current observations — so results are bit-identical
        to ``stagger=1`` for deterministic envs/policies (pinned in
        tests/test_serving.py). Each group runs a batch of B/stagger, which
        compiles per distinct group size.
        """
        if stagger > 1:
            return self._run_staggered(max_steps, on_step, stagger)
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

    def _run_staggered(self, max_steps: int, on_step, stagger: int):
        b = len(self.envs)
        if not 1 < stagger <= b:
            raise ValueError(f"stagger must be in (1, num_envs], got {stagger}")
        groups = [ids.tolist() for ids in np.array_split(np.arange(b), stagger)]
        inner = self.policy
        n_action = inner.n_action_steps
        action_dim = None

        obs = [env.reset() for env in self.envs]
        returns = np.zeros(b, np.float64)
        lengths = np.zeros(b, np.int64)
        done = np.zeros(b, bool)
        inner.reset()

        # Per-group action queues (chunking works per group) + in-flight
        # forwards. Prologue: dispatch every group before the tick loop so
        # each fetch happens ~one full tick after its dispatch.
        queues: List[deque] = [deque() for _ in groups]
        pending: List[Any] = [
            inner.dispatch_chunk(self._collect_obs(obs, ids)) for ids in groups
        ]

        for _ in range(max_steps):
            tick_actions = None
            for g, ids in enumerate(groups):
                if not queues[g]:
                    chunk = inner.fetch_chunk(pending[g])[:, :n_action]
                    queues[g].extend(np.moveaxis(chunk, 1, 0))
                    pending[g] = None
                actions_g = queues[g].popleft()
                if tick_actions is None:
                    action_dim = actions_g.shape[-1]
                    tick_actions = np.zeros((b, action_dim), np.float32)
                tick_actions[ids] = actions_g
                for local, i in enumerate(ids):
                    if done[i]:
                        continue
                    obs_i, reward, env_done, _ = self.envs[i].step(
                        np.asarray(actions_g[local])
                    )
                    obs[i] = obs_i
                    returns[i] += float(reward)
                    lengths[i] += 1
                    done[i] = bool(env_done)
                if not queues[g]:
                    # Queue drained: start the next forward for this group
                    # NOW — the host spends the rest of the tick on the other
                    # groups while the chip computes this one.
                    pending[g] = inner.dispatch_chunk(self._collect_obs(obs, ids))
            if on_step is not None:
                on_step(tick_actions, done)
            if done.all():
                break
        return {"returns": returns, "lengths": lengths, "done": done}
