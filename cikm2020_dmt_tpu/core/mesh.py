"""Device mesh + sharding runtime.

The reference parallelizes by cloning the graph onto N GPUs inside one
process and averaging gradients in-graph (reference run_dnn.py:45-80,
148-207).  The TPU-native equivalent is a ``jax.sharding.Mesh`` with two
logical axes:

    data  — batch-parallel replicas; gradients all-reduce over ICI
    model — row-sharding for the large embedding tables (Sku/Brand/Shopid)

Shardings are expressed as ``NamedSharding`` annotations on the param/batch
pytrees; XLA GSPMD inserts the collectives.  Multi-host: call
``jax.distributed.initialize`` (initialize_distributed) before building the
mesh; each process then feeds its own per-host batch shard
(data/pipeline.py shard_files keyed by process_index).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import DMTConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up; no-op for single-process runs."""
    if num_processes is None:
        num_processes = int(os.environ.get("DMT_NUM_PROCESSES", "1"))
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id)


def build_mesh(cfg: DMTConfig, devices: Optional[list] = None) -> Mesh:
    """(data x model) mesh over all devices.

    mesh_data/mesh_model from config; 0 or unset data axis -> fill with
    every device not used by the model axis.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = max(1, cfg.mesh_model)
    data = cfg.mesh_data if cfg.mesh_data > 0 else n // model
    if data * model != n:
        raise ValueError(
            f"mesh {data}x{model} does not cover {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: leading axis split over the data axis, replicated
    over model."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(cfg: DMTConfig, params, mesh: Mesh):
    """Sharding tree for a param pytree: large embedding tables row-shard
    over the model axis, everything else replicated.

    The row threshold (cfg.shard_rows_threshold) picks out Sku (5M),
    Shopid (230K), Brand (190K) under the default config — the tables the
    reference pins to host RAM (base.py:83) because they cannot replicate
    per GPU.
    """
    model_size = mesh.shape[MODEL_AXIS]
    n_dev = model_size * mesh.shape[DATA_AXIS]
    from ..parallel.full_shard import fms_table_rows
    fms = fms_table_rows(cfg, n_dev)

    def shard_of(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        in_table = any(k in ("emb", "emb_bias") for k in keys)
        if not (in_table and hasattr(leaf, "ndim") and leaf.ndim == 2):
            return NamedSharding(mesh, P())
        # full-mesh tables: rows over every device (data x model), the
        # all_to_all engine's layout (parallel/full_shard.py); the leaf
        # key IS the table name for params["emb"][name]
        name = keys[-1]
        if name in fms and leaf.shape[0] == fms[name]:
            return NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS), None))
        if (leaf.shape[0] >= cfg.shard_rows_threshold
                and leaf.shape[0] % model_size == 0
                and model_size > 1):
            return NamedSharding(mesh, P(MODEL_AXIS, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(shard_of, params)


def shard_params(cfg: DMTConfig, params, mesh: Mesh):
    shardings = param_shardings(cfg, params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
