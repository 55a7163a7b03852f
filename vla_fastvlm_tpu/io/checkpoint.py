"""Checkpoint I/O: reference-compatible layout, TPU-native internals.

Layout parity (reference ``trainer.py:246-255`` + ``utils/checkpoint.py:14-47``):

    output_dir/training_config.json
    output_dir/checkpoints/step-N/
        policy_config.json          # dataclass asdict of the policy config
        policy_state_dict.safetensors   # full params, dotted flat keys
        train_state/                # orbax: optimizer state + counters (resume)

The reference stores ``policy_state_dict.pt`` (torch pickle); safetensors is
the same role in a framework-neutral container (it is also what HF checkpoints
themselves use). The loader dispatches FastVLA vs legacy policy by the
presence of ``vlm_model_name`` in the config — the exact rule of reference
``utils/checkpoint.py:33-39``.
"""

from __future__ import annotations

import dataclasses
import json
import logging
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

logger = logging.getLogger(__name__)

POLICY_CONFIG = "policy_config.json"
POLICY_WEIGHTS = "policy_state_dict.safetensors"
TRAIN_STATE_DIR = "train_state"


# ----------------------------------------------------------------------
# pytree <-> flat dict


def flatten_params(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    for key, value in tree.items():
        path = f"{prefix}{key}"
        if isinstance(value, dict):
            flat.update(flatten_params(value, prefix=path + "."))
        else:
            flat[path] = np.asarray(value)
    return flat


def unflatten_params(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for path, value in flat.items():
        node = tree
        parts = path.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


# ----------------------------------------------------------------------
# policy checkpoints


def save_policy_checkpoint(checkpoint_dir: str | Path, config: Any, params: Dict) -> None:
    """Write policy_config.json + policy_state_dict.safetensors."""
    from safetensors.numpy import save_file

    checkpoint_dir = Path(checkpoint_dir)
    checkpoint_dir.mkdir(parents=True, exist_ok=True)
    config_dict = dataclasses.asdict(config) if dataclasses.is_dataclass(config) else dict(config)
    with open(checkpoint_dir / POLICY_CONFIG, "w", encoding="utf-8") as f:
        json.dump(config_dict, f, indent=2)
    flat = {
        k: np.ascontiguousarray(np.asarray(v))
        for k, v in flatten_params(jax.device_get(params)).items()
    }
    save_file(flat, str(checkpoint_dir / POLICY_WEIGHTS))


def load_policy_state(checkpoint_dir: str | Path) -> Tuple[Dict[str, Any], Dict]:
    """Read (config_dict, params_tree) from a checkpoint directory."""
    from safetensors.numpy import load_file

    checkpoint_dir = Path(checkpoint_dir)
    config_path = checkpoint_dir / POLICY_CONFIG
    weights_path = checkpoint_dir / POLICY_WEIGHTS
    if not config_path.exists():
        raise FileNotFoundError(f"Missing {POLICY_CONFIG} in {checkpoint_dir}")
    if not weights_path.exists():
        raise FileNotFoundError(f"Missing {POLICY_WEIGHTS} in {checkpoint_dir}")
    with open(config_path, encoding="utf-8") as f:
        config_dict = json.load(f)
    params = unflatten_params(load_file(str(weights_path)))
    return config_dict, params


def _filter_known_fields(cls, config: Dict[str, Any]) -> Dict[str, Any]:
    known = {f.name for f in dataclasses.fields(cls)}
    unknown = set(config) - known
    if unknown:
        logger.warning("Ignoring unknown config fields %s for %s", sorted(unknown), cls.__name__)
    return {k: v for k, v in config.items() if k in known}


def load_policy_from_checkpoint(
    checkpoint_dir: str | Path,
    device_preference: Optional[str] = None,
    strict: bool = True,
):
    """Load FastVLM policy weights from a checkpoint directory.

    Returns ``(policy, device)`` — parity with reference
    ``utils/checkpoint.py:14-47`` including the FastVLA/legacy dispatch rule
    and strict state-dict checking.
    """
    from ..device import get_best_device
    from ..fastvla import FastVLAConfig, FastVLAPolicy
    from ..model.fastvlm_adapter import FastVLMBackboneConfig
    from ..model.policy import FastVLMPolicy, FastVLMPolicyConfig

    config_dict, params = load_policy_state(checkpoint_dir)

    if "vlm_model_name" in config_dict:
        policy_cfg = FastVLAConfig(**_filter_known_fields(FastVLAConfig, config_dict))
        if getattr(policy_cfg, "action_head", "mlp") == "token":
            # Autoregressive action-token policy (fastvla/token_policy.py):
            # same checkpoint layout, no head sub-tree.
            from ..fastvla import FastVLMTokenPolicy

            policy = FastVLMTokenPolicy(policy_cfg)
        else:
            policy = FastVLAPolicy(policy_cfg)
    else:
        backbone_dict = config_dict.pop("backbone")
        backbone_cfg = FastVLMBackboneConfig(
            **_filter_known_fields(FastVLMBackboneConfig, backbone_dict)
        )
        policy_cfg = FastVLMPolicyConfig(
            backbone=backbone_cfg,
            **_filter_known_fields(FastVLMPolicyConfig, config_dict),
        )
        policy = FastVLMPolicy(policy_cfg)

    device = get_best_device(device_preference)
    if strict:
        expected = set(flatten_params(jax.device_get(policy.params)))
        got = set(flatten_params(params))
        if expected != got:
            missing = sorted(expected - got)[:5]
            unexpected = sorted(got - expected)[:5]
            raise ValueError(
                "Checkpoint state dict does not match policy parameters. "
                f"missing(sample)={missing} unexpected(sample)={unexpected}"
            )
    else:
        params = _merge_partial(jax.device_get(policy.params), params)
    # Place the loaded tree on the device ONCE. safetensors loads host
    # numpy; leaving numpy leaves in ``policy.params`` makes EVERY jitted
    # call re-upload the full tree (a 0.5B eval loop spends ~minutes/batch
    # on the tunnel re-shipping ~GBs — measured round 5: eval_dataset hit
    # its 30-min timeout on 16 batches before this fix).
    from ..device import place_params

    policy.load_params(place_params(params, device))
    return policy, device


def _merge_partial(base: Dict, overlay: Dict) -> Dict:
    out = dict(base)
    for key, value in overlay.items():
        if key in out and isinstance(out[key], dict) and isinstance(value, dict):
            out[key] = _merge_partial(out[key], value)
        else:
            out[key] = value
    return out


def prune_checkpoints(checkpoints_dir: str | Path, keep_last_n: int) -> list:
    """Delete the oldest ``step-N`` checkpoint dirs beyond ``keep_last_n``.

    Only numbered ``step-N`` directories participate; preemption/final
    checkpoints are never pruned. Returns the removed paths. (The reference
    writes unbounded checkpoints — 100 full policy+opt dirs over its default
    100k-step recipe; keep-last-N is the TPU build's GC.)
    """
    import re
    import shutil

    checkpoints_dir = Path(checkpoints_dir)
    if keep_last_n is None or keep_last_n <= 0 or not checkpoints_dir.exists():
        return []
    steps = []
    for child in checkpoints_dir.iterdir():
        match = re.fullmatch(r"step-(\d+)", child.name)
        if match and child.is_dir():
            steps.append((int(match.group(1)), child))
    steps.sort()
    removed = []
    for _, path in steps[:-keep_last_n] if keep_last_n else steps:
        shutil.rmtree(path, ignore_errors=True)
        removed.append(path)
    return removed


# ----------------------------------------------------------------------
# train state (resume): orbax


def save_train_state(checkpoint_dir: str | Path, state: Dict) -> None:
    """Persist the training state pytree (opt state, counters, rng) via orbax."""
    import orbax.checkpoint as ocp

    path = (Path(checkpoint_dir) / TRAIN_STATE_DIR).absolute()
    checkpointer = ocp.PyTreeCheckpointer()
    checkpointer.save(path, jax.device_get(state), force=True)


def load_train_state(checkpoint_dir: str | Path, template: Dict) -> Dict:
    """Restore a training state saved by ``save_train_state``.

    ``template`` supplies the pytree structure/dtypes (a freshly initialized
    state); restored arrays replace the template leaves.
    """
    import orbax.checkpoint as ocp

    path = (Path(checkpoint_dir) / TRAIN_STATE_DIR).absolute()
    checkpointer = ocp.PyTreeCheckpointer()
    restored = checkpointer.restore(path, item=jax.device_get(template))
    return restored
