from .logging import configure_logging

__all__ = ["configure_logging", "load_policy_from_checkpoint"]


def __getattr__(name):
    if name == "load_policy_from_checkpoint":
        from .checkpoint import load_policy_from_checkpoint

        return load_policy_from_checkpoint
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
