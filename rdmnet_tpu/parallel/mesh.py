"""Device-mesh utilities: data parallelism via jax.sharding.

Replaces the reference's NCCL DDP machinery (reference:
geotransformer/engine/base_trainer.py:63-78,181-198 and
geotransformer/utils/torch.py:16-34): the train batch carries a leading
batch axis sharded over the 'dp' mesh axis, parameters are replicated, and
XLA inserts the gradient all-reduce (psum over ICI) automatically under jit.
Multi-host: jax.distributed.initialize() before calling make_mesh gives a
global mesh spanning hosts (DCN between hosts, ICI within a slice).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kwargs) -> None:
    """Multi-host initialization (call once per host before device use).

    Thin wrapper over jax.distributed.initialize: coordinator/process info
    comes from the TPU environment automatically on Cloud TPU; kwargs
    override for manual setups. Replaces the reference's
    dist.init_process_group NCCL bootstrap (base_trainer.py:63-78).
    """
    import jax.distributed

    jax.distributed.initialize(**kwargs)


def make_mesh(dp: Optional[int] = None, devices=None) -> Mesh:
    """A 1-D data-parallel mesh over the first ``dp`` devices (all by default)."""
    devices = list(devices if devices is not None else jax.devices())
    if dp is None or dp <= 0:
        dp = len(devices)
    assert dp <= len(devices), f"requested dp={dp} > {len(devices)} devices"
    return Mesh(np.array(devices[:dp]), ("dp",))


def shard_batch(batch, mesh: Mesh):
    """Shard a batched pytree's leading axis over 'dp'.

    Multi-host: each process holds its OWN loader shard (PairLoader's
    per-host striding), so the leaves are process-local slices of a global
    batch — jax.device_put would wrongly treat them as identical global
    values. make_array_from_process_local_data assembles the true global
    array (global batch = num_processes x local batch).
    """
    sharding = NamedSharding(mesh, P("dp"))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.device_put(batch, sharding)


def replicate_to_mesh(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
