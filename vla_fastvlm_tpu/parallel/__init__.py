"""Parallelism: mesh construction + GSPMD sharding rules (SURVEY.md §2.3)."""

from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    initialize_distributed,
    make_mesh,
    single_device_mesh,
)
from .pipeline import (
    PIPE_AXIS,
    make_pipe_mesh,
    make_pipeline_train_step,
    pipeline_forward,
)
from .sharding import (
    batch_shardings,
    batch_spec,
    cache_shardings,
    fsdp_param_shardings,
    fsdp_spec_for_param,
    param_shardings,
    shard_batch,
    shard_cache,
    shard_params,
    spec_for_param,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "PIPE_AXIS",
    "make_pipe_mesh",
    "make_pipeline_train_step",
    "pipeline_forward",
    "batch_shardings",
    "batch_spec",
    "cache_shardings",
    "fsdp_param_shardings",
    "fsdp_spec_for_param",
    "shard_cache",
    "initialize_distributed",
    "make_mesh",
    "param_shardings",
    "shard_batch",
    "shard_params",
    "single_device_mesh",
    "spec_for_param",
]
