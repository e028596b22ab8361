"""Multi-host initialization + parameter sharding rules.

The communication backend of the framework (SURVEY.md §2.4): single-
controller JAX with ``jax.distributed.initialize`` across hosts, XLA
collectives over ICI within a slice and DCN across slices. There is no
NCCL/MPI bootstrap — sharding annotations are the entire distributed
programming model.

Sharding rules:
  - NeRF params: replicated by default; ``nerf_param_sharding`` optionally
    splits the 256-wide hidden layers across the ``model`` axis (tensor
    parallelism — the analog the reference lacks entirely). Column-parallel
    on every kernel's output dim; XLA inserts the all-gather/reduce where
    the skip concat and heads need full activations.
  - detector params: replicated (batch 8 images shard on ``data``).
  - ray/image batches: leading dim on ``data``.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host bootstrap. No-op on a single process (the common case in
    tests and single-slice runs); with arguments (or the JAX_COORDINATOR env
    conventions), joins a multi-host run so jax.devices() spans all hosts."""
    if num_processes is None or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def nerf_param_sharding(params, mesh: Mesh, tensor_parallel: bool = False):
    """Place NeRF params: replicated, or column-sharded over 'model'.

    Column-parallel: kernel [in, out] -> P(None, 'model'), bias [out] ->
    P('model'). Layers whose output feeds a concat or must be whole (alpha
    head width 1, rgb head width 3) stay replicated.
    """
    if not tensor_parallel or mesh.shape["model"] == 1:
        return jax.device_put(params, NamedSharding(mesh, P()))

    def place(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        wide = x.shape[-1] % mesh.shape["model"] == 0 and x.shape[-1] >= 128
        if name.endswith("_kernel") and wide:
            return jax.device_put(x, NamedSharding(mesh, P(None, "model")))
        if name.endswith("_bias") and wide:
            return jax.device_put(x, NamedSharding(mesh, P("model")))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, params)
