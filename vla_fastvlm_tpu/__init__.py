"""
vla_fastvlm_tpu
===============

A TPU-native (JAX/XLA/Pallas/pjit) Vision-Language-Action framework providing the
full capability surface of the reference `vla_fastvlm` package (see
reference `src/vla_fastvlm/__init__.py:9-20` for the export contract), rebuilt
from scratch for TPU:

- The FastVLM backbone (FastViTHD vision encoder + mm projector + Qwen2 decoder)
  is first-class in-repo JAX/Flax code (the reference loads it as opaque HF
  remote code with ``trust_remote_code=True``).
- Compute runs as one jitted XLA program; hot ops have Pallas TPU kernels.
- Scaling is expressed with ``jax.sharding`` meshes (data x model axes), not
  NCCL/DDP.
"""

from .device import (
    get_best_device,
    is_cuda_available,
    is_mps_available,
    is_tpu_available,
    move_batch_to_device,
)

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy exports: keep `import vla_fastvlm_tpu` light (no flax import) while
    # still exposing the reference's top-level API surface
    # (reference `src/vla_fastvlm/__init__.py:9-20`) plus framework layers.
    if name in ("FastVLAConfig", "FastVLAPolicy"):
        from . import fastvla

        return getattr(fastvla, name)
    if name == "FastVLMPolicy":
        from .model.policy import FastVLMPolicy

        return FastVLMPolicy
    if name in ("Trainer", "TrainingConfig"):
        from . import training

        return getattr(training, name)
    if name == "load_policy_from_checkpoint":
        from .io.checkpoint import load_policy_from_checkpoint

        return load_policy_from_checkpoint
    if name in ("models", "ops", "io", "data", "training", "parallel",
                "serving", "fastvla", "model", "utils", "native"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

__all__ = [
    "get_best_device",
    "is_cuda_available",
    "is_mps_available",
    "is_tpu_available",
    "move_batch_to_device",
    "FastVLMPolicy",
    "FastVLAConfig",
    "FastVLAPolicy",
]
