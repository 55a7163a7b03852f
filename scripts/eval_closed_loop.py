#!/usr/bin/env python
"""Closed-loop batched policy evaluation.

Drives B parallel environments with one batched TPU policy (the §3.3 serving
hot loop, BASELINE.json config #5). Environment backends:

- ``--env dummy``: built-in synthetic env (offline smoke; reports throughput
  and control-loop latency rather than task success);
- ``--env gym:<id>``: any gymnasium env whose observation dict carries an
  image and a state vector (key names configurable) — used for
  MetaWorld/ALOHA when those simulators are installed.

Reports episode returns/lengths plus actions/sec and p50 control-loop
latency.
"""

from __future__ import annotations

import json
import sys
import time
from dataclasses import dataclass
from typing import Optional

import numpy as np

import _bootstrap  # noqa: F401

from vla_fastvlm_tpu.serving import ActionQueuePolicy, BatchedEnvRunner
from vla_fastvlm_tpu.utils import configure_logging, load_policy_from_checkpoint
from vla_fastvlm_tpu.utils.cli import parse_cli


@dataclass
class ClosedLoopArgs:
    checkpoint_dir: Optional[str] = None  # None -> random-init policy
    model_id: str = "fastvlm-tiny"
    env: str = "dummy"
    num_envs: int = 16
    max_steps: int = 50
    task: str = "complete the task"
    n_action_steps: int = 1
    state_dim: int = 14
    action_dim: int = 14
    image_size: int = 64
    gym_image_key: str = "pixels"
    gym_state_key: str = "state"
    device: Optional[str] = None
    seed: int = 0
    # Serving-mode knobs for the random-init policy path (BASELINE config #5
    # at 7B scale: --model-id fastvlm-7b --quantization int8 --fabricate).
    dtype: str = "float32"
    quantization: str = "none"
    fabricate: bool = False
    # Model input resolution override (None -> preset default); env
    # observations stay at --image-size and are letterboxed by the policy.
    model_image_size: Optional[int] = None
    # Mesh factors for sharded serving (dp*tp devices; 1x1 = single chip).
    dp: int = 1
    tp: int = 1
    # >1 pipelines env groups against the chip: group g's forward runs on
    # device while the host steps the other groups' envs (same closed-loop
    # semantics; see BatchedEnvRunner.run).
    stagger: int = 1
    # --- autoregressive action-token policy (fastvla/token_policy.py) ---
    # "mlp" is the reference-parity regression head; "token" decodes
    # action_dim discrete tokens through the VLM's lm_head, which makes the
    # decode-serving stack below apply to closed-loop control.
    action_head: str = "mlp"
    action_bins: int = 256
    # Codebook clip range for the token head (see scripts/train.py: the
    # +/-1 default expects squashed/normalized actions; widen otherwise).
    action_token_low: float = -1.0
    action_token_high: float = 1.0
    # Action chunking (both head families): one forward emits
    # (chunk_size, action_dim); the queue serves n_action_steps of them.
    chunk_size: int = 1
    # Control-tick execution for the token head: "batch" = one jitted
    # prefill+scan program over all envs (the MLP-policy analogue);
    # "dense" | "paged" | "spec-paged" = requests drain through the
    # corresponding continuous-batching server (serving/token_policy_server).
    serving: str = "batch"
    num_slots: int = 16
    prefill_batch: int = 4
    page_size: int = 16
    kv_cache_quantization: str = "none"
    # spec-paged only: draft model + lookahead. "self" mounts the TARGET's
    # own params as the draft — every proposal verifies (acceptance = 1),
    # the measured UPPER bound of speculative closed-loop throughput
    # (fabricated weights give the ~zero-acceptance LOWER bound; real
    # checkpoints land in between — docs/VALIDATION.md §4).
    draft_model_id: str = "fastvlm-tiny"
    spec_k: int = 4
    # Print every control tick's latency as it lands (diagnosing slow
    # sessions: separates compile ticks from steady-state).
    log_ticks: bool = False


class DummyEnv:
    """Synthetic env: random images, integrator state, fixed horizon."""

    def __init__(self, horizon: int, state_dim: int, image_hw: int, seed: int):
        self.horizon = horizon
        self.state_dim = state_dim
        self.image_hw = image_hw
        self.rng = np.random.default_rng(seed)
        self.t = 0
        self.state = np.zeros(state_dim, np.float32)

    def _obs(self):
        return {
            "image": self.rng.random(
                (3, self.image_hw, self.image_hw), dtype=np.float32
            ),
            "state": self.state.copy(),
        }

    def reset(self):
        self.t = 0
        self.state = np.zeros(self.state_dim, np.float32)
        return self._obs()

    def step(self, action):
        self.t += 1
        self.state = 0.9 * self.state + 0.1 * np.asarray(
            action[: self.state_dim], np.float32
        )
        reward = -float(np.square(self.state).mean())
        return self._obs(), reward, self.t >= self.horizon, {}


class GymEnvAdapter:
    """Adapt a gymnasium env to the runner's obs dict protocol."""

    def __init__(self, env, image_key: str, state_key: str):
        self.env = env
        self.image_key = image_key
        self.state_key = state_key

    def _convert(self, obs):
        image = np.asarray(obs[self.image_key], np.float32)
        if image.max() > 1.0:
            image = image / 255.0
        if image.ndim == 3 and image.shape[-1] in (1, 3):
            image = np.transpose(image, (2, 0, 1))
        return {"image": image, "state": np.asarray(obs[self.state_key], np.float32)}

    def reset(self):
        obs, _info = self.env.reset()
        return self._convert(obs)

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action)
        return self._convert(obs), reward, terminated or truncated, info


def build_envs(args: ClosedLoopArgs):
    if args.env == "dummy":
        return [
            DummyEnv(args.max_steps, args.state_dim, args.image_size, args.seed + i)
            for i in range(args.num_envs)
        ]
    if args.env.startswith("gym:"):
        import gymnasium as gym

        env_id = args.env.split(":", 1)[1]
        return [
            GymEnvAdapter(
                gym.make(env_id), args.gym_image_key, args.gym_state_key
            )
            for _ in range(args.num_envs)
        ]
    raise ValueError(f"unknown env spec {args.env!r} (use 'dummy' or 'gym:<id>')")


def _build_token_server(args: ClosedLoopArgs, policy):
    """Mount the token policy's control ticks on a generation server
    (serving/token_policy_server.py): dense, paged, or speculative-paged."""
    from vla_fastvlm_tpu.serving import (
        GenerationServer,
        PagedGenerationServer,
        SpeculativePagedGenerationServer,
        TokenPolicyServer,
    )

    from vla_fastvlm_tpu.model.fastvlm_adapter import prepare_policy_images

    model = policy.backbone.model
    params = policy.backbone.params
    mcfg = policy.backbone.model_config
    bcfg = policy.backbone.config
    ids, _ = policy.backbone._prep_text([args.task])
    width = ids.shape[1] + args.state_dim
    kwargs = dict(
        num_slots=args.num_slots,
        prompt_len=width,
        max_new_tokens=policy.num_action_tokens,  # chunk_size * action_dim
        eos_token_id=-1,
        prefill_batch=args.prefill_batch,
        # Letterbox to the tower resolution INSIDE the admission programs:
        # the control loop ships raw env-res frames over the host boundary,
        # not 1024px upscales (serving/token_policy_server.py).
        image_prep=lambda imgs: prepare_policy_images(imgs, mcfg, bcfg),
    )
    if args.serving == "dense":
        server = GenerationServer(model, params, **kwargs)
    elif args.serving == "paged":
        server = PagedGenerationServer(
            model, params, page_size=args.page_size, **kwargs
        )
    elif args.serving == "spec-paged":
        draft, dparams = _build_draft(args, policy)
        server = SpeculativePagedGenerationServer(
            model, params, draft, dparams, k=args.spec_k,
            page_size=args.page_size, **kwargs,
        )
    else:
        raise ValueError(
            f"unknown --serving {args.serving!r} "
            "(use batch | dense | paged | spec-paged)"
        )
    return TokenPolicyServer(policy, server)


def _build_draft(args: ClosedLoopArgs, policy):
    """Vocab-matched multimodal draft at the TARGET's tower resolution
    (fabricated host-side — identical compute cost to real weights).

    ``--draft-model-id self``: the target drafts for itself (same model,
    same params) — greedy verification accepts every window, so the run
    measures the acceptance=1 upper bound of the speculative server."""
    import jax
    import jax.numpy as jnp

    if args.draft_model_id == "self":
        return policy.backbone.model, policy.backbone.params

    from vla_fastvlm_tpu.device import place_params
    from vla_fastvlm_tpu.io.fabricate import fabricate_like
    from vla_fastvlm_tpu.models.fastvlm import (
        FastVLM,
        fastvlm_0_5b,
        fastvlm_1_5b,
        fastvlm_7b,
        fastvlm_tiny,
    )
    from vla_fastvlm_tpu.serving.generate import build_cache

    presets = {
        "fastvlm-tiny": fastvlm_tiny,
        "fastvlm-0.5b": fastvlm_0_5b,
        "fastvlm-1.5b": fastvlm_1_5b,
        "fastvlm-7b": fastvlm_7b,
    }
    tcfg = policy.backbone.model_config
    cfg = presets[args.draft_model_id]()
    cfg = cfg.replace(
        image_size=tcfg.image_size,
        text=cfg.text.replace(
            vocab_size=tcfg.text.vocab_size,
            dtype=tcfg.text.dtype,
            param_dtype=tcfg.text.param_dtype,
        ),
    )
    draft = FastVLM(cfg)
    s = cfg.image_size
    init_cache = build_cache(cfg, 1, 4, 2)
    shapes = jax.eval_shape(
        lambda: FastVLM(cfg).init(
            jax.random.PRNGKey(0),
            jnp.ones((1, 3, s, s), cfg.text.dtype),
            jnp.ones((1, 4), jnp.int32),
            jnp.ones((1, 4), jnp.int32),
            init_cache,
            method=FastVLM.prefill,
        )["params"]
    )
    dparams = place_params(
        fabricate_like(shapes, seed=args.seed + 7), jax.devices()[0]
    )
    return draft, dparams


def main(args: ClosedLoopArgs) -> None:
    if args.device:
        import os

        if args.dp * args.tp > 1 and args.device == "cpu":
            flags = os.environ.get("XLA_FLAGS", "")
            if "host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    flags
                    + f" --xla_force_host_platform_device_count={args.dp * args.tp}"
                ).strip()
        import jax

        jax.config.update("jax_platforms", args.device)
    configure_logging()
    from vla_fastvlm_tpu.device import enable_compilation_cache

    enable_compilation_cache()

    if args.checkpoint_dir:
        policy, _device = load_policy_from_checkpoint(args.checkpoint_dir)
    else:
        from vla_fastvlm_tpu.fastvla import (
            FastVLAConfig,
            FastVLAPolicy,
            FastVLMTokenPolicy,
        )

        config = FastVLAConfig(
            vlm_model_name=args.model_id,
            bootstrap_model_name=args.model_id,
            state_dim=args.state_dim,
            action_dim=args.action_dim,
            image_size=args.model_image_size,
            dtype=args.dtype,
            param_dtype=args.dtype,
            quantization=args.quantization,
            kv_cache_quantization=args.kv_cache_quantization,
            fabricate_params=args.fabricate,
            dropout=0.0,
            action_head=args.action_head,
            action_bins=args.action_bins,
            action_token_low=args.action_token_low,
            action_token_high=args.action_token_high,
            chunk_size=args.chunk_size,
        )
        if args.action_head == "token":
            policy = FastVLMTokenPolicy(config)
        else:
            policy = FastVLAPolicy(config)

    if args.action_head == "token" and args.serving != "batch":
        policy = _build_token_server(args, policy)
    elif args.serving != "batch":
        raise ValueError(
            "--serving other than 'batch' requires --action-head token "
            "(the MLP policy's control tick is a single prefill; the "
            "generation servers serve decode-shaped work)"
        )

    if args.dp * args.tp > 1:
        # TP x DP serving (the 7B-on-v5e-8 configuration): the sharded
        # runtime is forward-compatible with the action queue.
        from vla_fastvlm_tpu.parallel import make_mesh
        from vla_fastvlm_tpu.serving import ShardedPolicyRuntime

        policy = ShardedPolicyRuntime(
            policy, make_mesh(data=args.dp, model=args.tp)
        )

    envs = build_envs(args)
    runner = BatchedEnvRunner(
        envs, ActionQueuePolicy(policy, args.n_action_steps), task=args.task
    )

    tick_times = []

    def on_step(actions, done):
        now = time.perf_counter()
        if args.log_ticks:
            prev = tick_times[-1] if tick_times else t0
            print(
                f"[tick {len(tick_times)}] {(now - prev) * 1e3:.0f} ms",
                flush=True,
            )
        tick_times.append(now)

    t0 = time.perf_counter()
    result = runner.run(
        max_steps=args.max_steps, on_step=on_step, stagger=args.stagger
    )
    elapsed = time.perf_counter() - t0

    deltas = np.diff([t0] + tick_times)
    total_actions = int(result["lengths"].sum())
    summary = {
        "num_envs": args.num_envs,
        "mean_return": float(result["returns"].mean()),
        "mean_length": float(result["lengths"].mean()),
        "total_actions": total_actions,
        "actions_per_sec": round(total_actions / elapsed, 2),
        "p50_control_latency_ms": round(float(np.median(deltas)) * 1e3, 2),
    }
    if hasattr(policy, "server_programs"):  # TokenPolicyServer bridge
        # Decode-stack decomposition (serving/token_policy_server.py): how
        # many dispatched device programs each control tick cost on average
        # (RTT units on the tunnel) and the logical decode-tick count.
        summary["control_ticks"] = policy.control_ticks
        summary["server_programs_per_control_tick"] = round(
            policy.server_programs / max(policy.control_ticks, 1), 2
        )
        summary["server_ticks_per_control_tick"] = round(
            policy.server_ticks / max(policy.control_ticks, 1), 2
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main(parse_cli(ClosedLoopArgs, prog="eval_closed_loop.py"))
