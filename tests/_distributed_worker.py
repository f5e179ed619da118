"""Worker process for the 2-process jax.distributed CPU test
(test_parallel.py::test_initialize_distributed_two_processes).

Usage: python _distributed_worker.py <process_id> <coordinator_address>

Each worker owns 2 virtual CPU devices; together they form a 4-device
global mesh.  Exercises parallel.mesh.initialize_distributed (the DCN
bootstrap path, SURVEY §2.9) plus one cross-process psum collective over
the chains axis.
"""

import os
import sys
from pathlib import Path

pid = int(sys.argv[1])
coord = sys.argv[2]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

# sitecustomize in this image force-registers a remote TPU plugin; the
# platform must be flipped via jax.config after import (see conftest.py)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import shard_map  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from adaptive_mcmc_tpu.parallel.mesh import (  # noqa: E402
    CHAIN_AXIS,
    chain_mesh,
    initialize_distributed,
)


def main():
    initialize_distributed(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()
    assert len(jax.local_devices()) == 2

    mesh = chain_mesh()
    sharding = NamedSharding(mesh, P(CHAIN_AXIS))
    local = np.arange(2, dtype=np.float32) + 2 * pid  # global [0, 1, 2, 3]
    garr = jax.make_array_from_process_local_data(sharding, local, (4,))

    @jax.jit
    def total(x):
        return shard_map(
            lambda v: jax.lax.psum(jnp.sum(v), CHAIN_AXIS),
            mesh=mesh,
            in_specs=P(CHAIN_AXIS),
            out_specs=P(),
        )(x)

    out = float(jax.device_get(total(garr)))
    assert out == 6.0, out
    print(f"worker {pid} ok", flush=True)


if __name__ == "__main__":
    main()
