"""Device selection and host<->device movement utilities.

TPU-native rework of the reference ``src/vla_fastvlm/device.py`` (priority
cuda>mps>cpu there, :21-43; recursive batch move :46-56). Here the runtime is
PJRT: priority is tpu > gpu > cpu, and the same ``FASTVLM_FORCE_DEVICE=cpu``
escape hatch is honored (reference ``device.py:11,17``).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Literal, Optional

import jax
import numpy as np

DeviceLiteral = Literal["tpu", "gpu", "cuda", "cpu"]

_FORCE_ENV = "FASTVLM_FORCE_DEVICE"
_CACHE_ENV = "FASTVLM_COMPILATION_CACHE"


def _host_fingerprint() -> str:
    """CPU-feature fingerprint partitioning the persistent cache per host.

    XLA:CPU AOT executables are machine-feature-specific, but the cache key
    is HLO-only — loading an entry written on a host with different ISA
    extensions SIGILLs the process mid-run (observed live: a cached CPU
    train step compiled with +prefer-no-gather killed the smoke run on a
    host without it; cpu_aot_loader logs the mismatch then crashes). TPU
    entries are tunnel-compiled and safe, but partitioning by host CPU
    flags is cheap and also correct for them.

    The signature hashes the cpuinfo *model name* line as well as the flags
    line: LLVM tuning features like +prefer-no-gather derive from the CPU
    model, not from any cpuinfo flag, so two hosts can share a flags line
    yet produce incompatible AOT code (observed live as cpu_aot_loader
    feature-mismatch warnings on entries written under the flags-only
    fingerprint).
    """
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            wanted = ("flags", "model name")
            seen: dict = {}
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in wanted and key not in seen:
                    seen[key] = line.strip()
                if len(seen) == len(wanted):
                    break
            sig = "|".join(seen[k] for k in sorted(seen))
    except OSError:
        sig = ""
    if not sig:
        import platform

        sig = platform.processor() or platform.machine()
    return hashlib.sha1(sig.encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> Optional[str]:
    """Persist compiled XLA executables across processes.

    Cold compiles dominate CLI startup on remote/tunneled TPU backends
    (minutes for the 0.5B program set — CLAUDE.md); JAX's compilation cache
    keyed on HLO makes every invocation after the first start warm. Opt-out
    with ``FASTVLM_COMPILATION_CACHE=off``; override the directory with the
    same variable or the ``path`` argument. Returns the directory in use
    (None when disabled or unsupported).

    No reference counterpart (torch eager has no compile step).
    """
    env = os.environ.get(_CACHE_ENV, "")
    if env.lower() in ("off", "0", "false", "disabled"):
        return None
    cache_dir = path or (env if env else None) or os.path.join(
        os.path.expanduser("~"), ".cache", "vla_fastvlm_tpu",
        f"xla_cache-{_host_fingerprint()}",
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every program, even fast-compiling ones: the RTT to a remote
        # compile service dwarfs local compile time for small programs.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax without the knobs
        return None
    return cache_dir


def _force_cpu() -> bool:
    return os.environ.get(_FORCE_ENV, "").lower() == "cpu"


def _devices_of(platform: str) -> list[jax.Device]:
    try:
        return jax.devices(platform)
    except RuntimeError:
        return []


def is_tpu_available() -> bool:
    """True if a TPU backend is available and not disabled via FASTVLM_FORCE_DEVICE."""
    return bool(_devices_of("tpu")) and not _force_cpu()


def is_cuda_available() -> bool:
    """True if a GPU backend is available (API parity with the reference)."""
    return bool(_devices_of("gpu")) and not _force_cpu()


def is_mps_available() -> bool:
    """Always False on a JAX/TPU stack; kept for reference API parity."""
    return False


def get_best_device(preferred: Optional[DeviceLiteral] = None) -> jax.Device:
    """Pick the most capable runtime device.

    Priority (reference ``device.py:21-43`` adapted to PJRT):
      1. User-provided ``preferred`` platform if available.
      2. TPU.
      3. GPU.
      4. CPU.
    """
    if preferred:
        preferred = preferred.lower()  # type: ignore[assignment]
        if preferred == "cuda":
            preferred = "gpu"
        if preferred in ("tpu", "gpu") and not _force_cpu():
            devs = _devices_of(preferred)
            if devs:
                return devs[0]
        if preferred == "cpu":
            return _devices_of("cpu")[0]

    if is_tpu_available():
        return _devices_of("tpu")[0]
    if is_cuda_available():
        return _devices_of("gpu")[0]
    return _devices_of("cpu")[0]


def move_batch_to_device(batch: dict, device: jax.Device) -> dict:
    """Recursively place array-valued entries of ``batch`` on ``device``.

    Mirrors reference ``device.py:46-56``: dicts are recursed, arrays are moved,
    everything else (task strings, metadata) passes through untouched.
    """
    result: dict = {}
    for key, value in batch.items():
        if isinstance(value, dict):
            result[key] = move_batch_to_device(value, device)
        elif isinstance(value, (jax.Array, np.ndarray)):
            result[key] = jax.device_put(value, device)
        else:
            result[key] = value
    return result


def tree_to_host(tree: Any) -> Any:
    """Bring a pytree of device arrays back to host numpy."""
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree
    )


# TPU s4 arrays are stored packed (two nibbles/byte, tiling (64,128)(8,1)).
# jax 0.9 cannot RELAYOUT an s4 array: the relayout runs through device_put,
# which internally jit-compiles a repack, whose own argument handling calls
# device_put again — "RecursionError: Recursively calling jit" (reproduced
# live on the v5e tunnel; plain jit args, AOT calls, and explicit-Format
# device_put all hit it). The escape: never hand jit an s4 array in the
# wrong layout. Every TPU consumer we lowered (plain dot, grouped einsum,
# reduce; ranks 2-3) asks for the same canonical format — row-major
# major_to_minor + this tiling — so a jitted int8->int4 cast whose OUTPUT
# format is pinned to it produces arrays every downstream program accepts
# with zero relayout.
_INT4_TILING = ((64, 128), (8, 1))


def _disable_persistent_cache_for_s4(_done=[]):
    """The persistent compilation cache corrupts s4-argument executables.

    Measured on the v5e tunnel (two-process repro, round 3): an executable
    with an s4 input DESERIALIZED from the persistent cache reports the
    correct canonical input Format via ``input_formats`` but still decides
    at dispatch that the (exactly-matching) argument needs a relayout —
    landing in the s4 ``device_put`` RecursionError above. Fresh compiles
    of the identical HLO run fine, with either matmul formulation, so the
    defect is in PJRT executable (de)serialization of sub-byte layouts,
    not in our programs. Until that is fixed upstream, any process that
    mints TPU s4 arrays stops using the persistent cache (fresh compiles
    only — correctness over the warm-start win for int4 CLIs).
    """
    if _done:
        return
    _done.append(True)
    try:
        if jax.config.jax_compilation_cache_dir:
            jax.config.update("jax_enable_compilation_cache", False)
            logging.getLogger(__name__).warning(
                "int4 staging: persistent XLA compilation cache disabled for "
                "this process (s4 executables do not survive cache "
                "deserialization on this backend; see device.py)"
            )
    except Exception:  # pragma: no cover - config knob missing
        pass


def _patch_s4_layout_eq(_done=[]):
    """jax 0.9 s4 layout-equality workaround (annotation-only mismatch).

    PJRT reports ``element_size_in_bits=0`` for rank>=3 s4 arrays while the
    same arrays at rank 2 — and every compiled executable's s4 *parameter*
    layout, because ``Layout._to_xla_layout`` force-fills the 4 for sub-byte
    integer dtypes — report 4. Dispatch compares ``x.format.layout`` against
    the executable's entry layout with ``Layout.__eq__``, so a rank-3 s4
    argument can NEVER match (0 vs 4), no matter what ``in_shardings`` pins;
    jax then attempts an s4 relayout, which is the ``device_put``
    RecursionError above. Reproduced live on the v5e tunnel (round 3,
    0.5b/7b int4 prefill with fused-dequant matmuls).

    The physical bytes are identical in both reports — same major_to_minor,
    same packed tiling; only the metadata annotation differs — so treating
    {0, 4} as equal *iff every other field matches exactly* makes dispatch
    correctly pass the array zero-copy. A genuinely different s4 layout
    (e.g. byte-per-nibble storage) has a different tiling and still
    mismatches. Hash stays unpatched: unequal hashes for now-equal layouts
    can only cause a cache miss, never a wrong hit.
    """
    if _done:
        return
    _done.append(True)
    from jax._src import layout as _jsl

    orig_eq = _jsl.Layout.__eq__

    def eq(self, other):
        if orig_eq(self, other):
            return True
        if not isinstance(other, _jsl.Layout):
            return NotImplemented
        return (
            self.major_to_minor == other.major_to_minor
            and self.tiling is not None
            and self.tiling == other.tiling
            and {
                self._sub_byte_element_size_in_bits,
                other._sub_byte_element_size_in_bits,
            }
            == {0, 4}
        )

    _jsl.Layout.__eq__ = eq


def _int4_caster(ndim, sharding, _cache={}):
    import jax.numpy as jnp
    from jax.experimental import layout as jl

    _disable_persistent_cache_for_s4()
    _patch_s4_layout_eq()
    key = (ndim, sharding)
    if key not in _cache:
        lay = jl.Layout(
            major_to_minor=tuple(range(ndim)),
            tiling=_INT4_TILING,
            sub_byte_element_size_in_bits=4,
        )
        fmt = jl.Format(lay, sharding)
        _cache[key] = jax.jit(
            lambda x: x.astype(jnp.int4), out_shardings=fmt
        )
    return _cache[key]


def stage_int4(leaf, sharding) -> jax.Array:
    """Place one int4 leaf under ``sharding`` without an s4 relayout.

    Host/CPU leaves stage as int8 nibbles ``device_put`` under ``sharding``
    and cast on device into the canonical packed Format (the note above).
    TPU-resident s4 leaves — committed or not (e.g. produced by running
    ``quantize_params`` on the default device) — cannot take that path (s4
    cannot D2H-fetch on this backend); they are already in the canonical
    format — the only way an s4 device array exists under our invariant —
    so the same Format-pinned cast runs on them directly as an identity
    repack. That in-place path requires the leaf's devices to be inside
    ``sharding``'s (true for the 1-chip mesh and any mesh built over the
    default device); re-placing a device s4 tree onto a disjoint mesh is
    unsupported — quantize host-side and pass the host tree instead.
    """
    if (
        isinstance(leaf, jax.Array)
        and not isinstance(leaf, jax.core.Tracer)
        and any(d.platform != "cpu" for d in leaf.devices())
    ):
        lay = leaf.format.layout
        # PJRT reports sub_byte_element_size_in_bits=0 on rank>=3 s4 arrays
        # (the {0,4} annotation bug _patch_s4_layout_eq documents), including
        # arrays this module itself staged canonically — so annotation 0 is
        # accepted IFF the tiling is the canonical packed one (a genuinely
        # different layout, e.g. byte-per-nibble, has a different tiling).
        bits = lay._sub_byte_element_size_in_bits
        if (
            lay.major_to_minor != tuple(range(leaf.ndim))
            or bits not in (0, 4)
            or (bits == 0 and lay.tiling != _INT4_TILING)
        ):
            # A non-canonical device s4 array is unrescuable (no D2H, no
            # relayout). quantize_kernel_int4 pins the canonical Format for
            # every concrete TPU array it creates, so this only fires on s4
            # arrays minted outside this codebase's staging paths.
            raise ValueError(
                "TPU-resident int4 array in non-canonical layout "
                f"{lay}: cannot be re-placed (jax 0.9 s4 relayout bug, see "
                "device.py). Quantize host-side, or create s4 arrays via "
                "quantize_kernel_int4 / place_params."
            )
        return _int4_caster(leaf.ndim, sharding)(leaf)
    h8 = np.asarray(leaf).astype(np.int8)
    return _int4_caster(h8.ndim, sharding)(jax.device_put(h8, sharding))


def int4_entry_formats(tree: Any, sharding=None) -> Any:
    """``in_shardings`` pytree pinning canonical entry layouts for s4 leaves.

    XLA's layout assignment sometimes drops the sub-byte annotation from an
    s4 parameter's entry layout (observed: a jitted prefill whose fused int4
    matmuls made the executable want ``T(64,128)(8,1)`` with element size 0
    instead of 4 for scanned weight stacks). Dispatching a canonically-
    staged s4 array into such an executable correctly detects the mismatch
    and attempts a relayout — which is the s4 ``device_put`` recursion bug
    above. Passing this tree as the params entry of ``jax.jit``'s
    ``in_shardings`` forces the executable to accept the canonical packed
    format (the only format our s4 arrays can exist in), closing the loop
    on the invariant: staging pins the OUT format, this pins the IN format.

    The pinned Format is read off each staged array (``leaf.format``), NOT
    reconstructed: jax normalizes the sub-byte annotation differently by
    rank (a staged rank-2 s4 array reports ``sub_byte_element_size_in_bits=4``
    while a rank-3 scan stack of the same staging path reports 0), and the
    jit-boundary check compares the executable's entry layout against the
    array's reported one verbatim. Echoing the array's own Format makes the
    comparison pass by construction. Leaves must therefore already be staged
    device arrays (run ``place_params`` first).

    Float/int8 leaves map to ``sharding`` if given (must then cover every
    leaf's placement) or ``UNSPECIFIED`` (None) otherwise.
    """
    import jax.numpy as jnp

    def spec(leaf):
        dtype = getattr(leaf, "dtype", None)
        if dtype is not None and dtype == jnp.int4:
            if not isinstance(leaf, jax.Array) or isinstance(
                leaf, jax.core.Tracer
            ):
                raise TypeError(
                    "int4_entry_formats requires staged device arrays "
                    "(run place_params first); got a host leaf of shape "
                    f"{getattr(leaf, 'shape', None)}"
                )
            return leaf.format
        return sharding

    return jax.tree_util.tree_map(spec, tree)


def place_params(tree: Any, device: Optional[jax.Device] = None) -> Any:
    """``jax.device_put`` for a parameter tree, safe for int4 leaves.

    Float/int8 leaves go through plain ``device_put``. int4 leaves on
    non-CPU backends are staged as int8 nibbles and cast on device with the
    canonical packed output format (see note above) — the only transfer
    path that neither materializes a wrong-layout s4 array nor triggers the
    relayout recursion. CPU backends take the plain path (no tiled layouts
    there; the virtual-mesh tests exercise it).
    """
    import jax.numpy as jnp

    device = device or jax.devices()[0]
    plain = device.platform == "cpu"

    def put(leaf):
        dtype = getattr(leaf, "dtype", None)
        if dtype is not None and dtype == jnp.int4 and not plain:
            return stage_int4(leaf, jax.sharding.SingleDeviceSharding(device))
        return jax.device_put(leaf, device)

    return jax.tree_util.tree_map(put, tree)
