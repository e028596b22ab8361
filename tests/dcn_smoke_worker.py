"""Two-process DCN smoke worker (VERDICT r2 #9): exercises the framework's
multi-host bootstrap (parallel.distributed.initialize_distributed) plus one
cross-process XLA collective on CPU — the closest this single-host
environment gets to a real DCN run. Spawned by
tests/test_distributed.py::test_two_process_dcn_smoke.

Usage: python dcn_smoke_worker.py <process_id> <port>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    pid, port = int(sys.argv[1]), int(sys.argv[2])

    from neuralsim_tpu.parallel.distributed import initialize_distributed

    joined = initialize_distributed(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid)
    assert joined, "two-process run must initialize"
    assert jax.process_count() == 2
    assert jax.device_count() == 2 * jax.local_device_count()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    # global mesh over both processes' devices; each contributes its shard
    mesh = Mesh(np.array(jax.devices()), ("data",))
    n_local = jax.local_device_count()
    local = [jax.device_put(jnp.full((1,), float(pid + 1)), d)
             for d in jax.local_devices()]
    garr = jax.make_array_from_single_device_arrays(
        (2 * n_local,), NamedSharding(mesh, P("data")), local)

    # cross-process reduction: the DCN psum the sharded pipeline relies on
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
    v = float(np.asarray(total.addressable_shards[0].data))
    expected = float(n_local * (1 + 2))
    assert v == expected, (v, expected)
    print(f"p{pid}: DCN-SMOKE-OK psum={v}")


if __name__ == "__main__":
    main()
