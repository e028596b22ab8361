"""Device mesh + sharding utilities — the framework's distributed backbone.

The reference's only distributed machinery is dormant torch.distributed/NCCL
scaffolding (SURVEY.md §2.4; reference ``optimization/utils/defaults.py:
320-323``) that the pipeline never exercises. Here scale-out is first-class
and TPU-native: a ``jax.sharding.Mesh`` with axes ``('data', 'model')``;
ray/image batches are sharded on ``data`` (the context-parallel analog over
ICI), parameters are replicated (or sharded on ``model`` for wide layers),
and XLA inserts the collectives (psum for loss/grad reductions) during pjit
partitioning — there is no hand-written NCCL bootstrap to port.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code spans slices (ICI within a slice, DCN across).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ('data', 'model') mesh.

    data=-1 consumes all remaining devices on the data axis.
    """
    devs = np.array(devices if devices is not None else jax.devices())
    n = devs.size
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        devs = devs[: data * model]
    return Mesh(devs.reshape(data, model), axis_names=("data", "model"))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (e.g. NeRF params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_rays(rays, mesh: Mesh):
    """Shard a flat [N, ...] ray array along the data axis. Pads N up to a
    multiple of the axis size (renderers ignore padded tail rows)."""
    return jax.device_put(rays, NamedSharding(mesh, P("data")))


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Shard every leaf's leading dimension along ``axis``."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, k: int) -> int:
    return -(-n // k) * k


def shard_map_compat(f, mesh: Mesh, in_specs, out_specs):
    """shard_map across JAX API generations: the replication-check kwarg was
    renamed check_rep -> check_vma when shard_map moved out of experimental;
    we always disable it (renderer outputs are genuinely device-varying)."""
    try:
        from jax import shard_map as _sm
    except ImportError:  # older jax: experimental namespace only
        from jax.experimental.shard_map import shard_map as _sm
    try:
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    except TypeError:
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)
