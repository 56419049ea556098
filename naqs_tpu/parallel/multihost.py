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

    On Cloud TPU pods all arguments auto-detect from the environment. A
    failure is only swallowed when the caller did NOT explicitly request a
    multi-process run (auto-detection on a single machine raising is the
    normal single-process case); an explicit request that fails re-raises —
    masking a real init failure would silently train on 1/N of the fleet.
    """
    explicit = num_processes is not None and num_processes > 1
    if jax.distributed.is_initialized():
        # idempotent: a second call in an already-initialized process is a
        # no-op success, not a failure to re-raise
        return True
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except (ValueError, RuntimeError):
        if explicit:
            raise
        return False


def device_key_shard(key, mesh) -> jax.Array:
    """Split a PRNG key into one per global device, sharded over the mesh.

    Every host computes the same split deterministically and contributes its
    addressable shards via make_array_from_callback (device_put cannot target
    non-addressable devices in a multi-process run)."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.devices.size
    key_data = np.asarray(jax.random.key_data(jax.random.split(key, n)))
    sharding = NamedSharding(mesh, P("dp"))
    global_data = jax.make_array_from_callback(
        key_data.shape, sharding, lambda idx: key_data[idx]
    )
    return jax.random.wrap_key_data(global_data)
