"""LeRobot plugin entrypoint for the TPU FastVLA policy.

Parity with reference ``src/vla_fastvlm/lerobot_fastvla/__init__.py``:
importing this package registers ``policy.type=fastvla``, discoverable via
``--policy.discover_packages_path=vla_fastvlm_tpu.lerobot_fastvla``
(reference README.md:66-83).

The registration needs the ``lerobot`` package (the plugin's torch host).
Where LeRobot is absent the package still imports — so the torch<->JAX
bridge (``torch_bridge``, lerobot-free) stays usable — and accessing the
plugin symbols raises a pointed ImportError instead.
"""

try:
    import lerobot  # noqa: F401

    _HAS_LEROBOT = True
except ImportError:
    _HAS_LEROBOT = False

if _HAS_LEROBOT:
    from .configuration_fastvla import FastVLAConfig
    from .modeling_fastvla import FastVLAPolicy
    from .processor_fastvla import make_fastvla_pre_post_processors
else:

    def __getattr__(name):
        if name in (
            "FastVLAConfig",
            "FastVLAPolicy",
            "make_fastvla_pre_post_processors",
        ):
            raise ImportError(
                "vla_fastvlm_tpu.lerobot_fastvla requires the `lerobot` "
                "package (the plugin host). For LeRobot-free use, import the "
                "core policy from vla_fastvlm_tpu.fastvla instead."
            )
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "FastVLAConfig",
    "FastVLAPolicy",
    "make_fastvla_pre_post_processors",
]
