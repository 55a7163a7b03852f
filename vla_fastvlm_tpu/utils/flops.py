"""Model-FLOPs accounting and MFU (model FLOPs utilization).

The reference publishes no efficiency numbers at all (SURVEY.md §6); BASELINE
rows here carry an MFU column so "is it actually fast?" is answerable from
the artifacts. FLOPs come from XLA's own cost model on the *compiled*
program (``Compiled.cost_analysis()``) — no hand-derived formulas to drift
out of sync with the model code.
"""

from __future__ import annotations

from typing import Optional

import jax

# Peak dense-matmul throughput per chip, bf16, FLOP/s. Sources: public TPU
# spec sheets (v5e 197 TF/s bf16; v5p 459; v4 275; v3 123; v6e/Trillium 918).
_PEAK_BF16 = {
    "v5 lite": 197e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v3": 123e12,
    "v6 lite": 918e12,
    "v6e": 918e12,
}


def device_peak_flops(device: Optional[jax.Device] = None) -> Optional[float]:
    """Peak bf16 FLOP/s for ``device``, or None when unknown (e.g. CPU)."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in _PEAK_BF16.items():
        if key in kind:
            return peak
    return None


def compiled_flops(compiled) -> Optional[float]:
    """Total FLOPs of a ``jax.jit(...).lower(...).compile()`` program.

    Returns None when the backend exposes no cost analysis.
    """
    try:
        analysis = compiled.cost_analysis()
    except Exception:
        return None
    if isinstance(analysis, (list, tuple)):
        analysis = analysis[0] if analysis else None
    if not analysis:
        return None
    flops = analysis.get("flops")
    return float(flops) if flops and flops > 0 else None


def mfu(
    flops_per_step: Optional[float],
    step_time_s: float,
    n_chips: int = 1,
    device: Optional[jax.Device] = None,
) -> Optional[float]:
    """Fraction of aggregate peak: model FLOPs / (time * chips * peak)."""
    peak = device_peak_flops(device)
    if flops_per_step is None or peak is None or step_time_s <= 0:
        return None
    return flops_per_step / (step_time_s * n_chips * peak)
