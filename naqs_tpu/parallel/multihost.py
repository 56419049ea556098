"""Multi-host (multi-slice) initialization for data-parallel VMC.

The sharded training step (parallel/step.py) is host-count agnostic: the
mesh spans all global devices and the only cross-device traffic is the
all-gather of the sampled-psi table plus psum'd scalars/grads — ICI within
a slice, DCN across slices, both handled by the same collectives.

Usage on each host of a multi-host run:

    from naqs_tpu.parallel.multihost import initialize_distributed
    initialize_distributed()           # env-driven (TPU pods auto-detect)
    mesh = make_mesh()                 # global mesh over all devices
    step = make_sharded_train_step(cfg, opt, mesh, capacity_per_device)

Each host feeds the same replicated params and its slice of the key array;
jax's global-array machinery routes the rest.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed; no-op (returns False) when single-process.

    On Cloud TPU pods all arguments auto-detect from the environment.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except (ValueError, RuntimeError):
        # already initialized, or single-process environment
        return False


def device_key_shard(key, mesh) -> jax.Array:
    """Split a PRNG key into one per global device, sharded over the mesh.

    Every host computes the same split deterministically; jax places each
    host's shard locally.
    """
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.devices.size
    keys = jax.random.split(key, n)
    return jax.device_put(keys, NamedSharding(mesh, P("dp")))
