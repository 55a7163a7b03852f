"""Checkpoint loading util.

Parity location for reference ``src/vla_fastvlm/utils/checkpoint.py``; the
implementation lives in ``vla_fastvlm_tpu.io.checkpoint`` (weight I/O layer).
"""

from ..io.checkpoint import load_policy_from_checkpoint

__all__ = ["load_policy_from_checkpoint"]
