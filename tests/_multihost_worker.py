"""Worker process for the 2-process jax.distributed localhost test.

Launched by tests/test_multihost.py with (coordinator_port, process_id).
Each process owns 2 virtual CPU devices (4 global); it initializes
jax.distributed, builds the global mesh, and runs ONE sharded VMC training
step on H2 — the full multihost path of parallel/step.py + multihost.py.
Prints `MULTIHOST_OK <e_loc> <n_unique>` on success.
"""

import os
import sys


def main():
    port, pid = sys.argv[1], int(sys.argv[2])
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from naqs_tpu.parallel.multihost import initialize_distributed, device_key_shard

    assert initialize_distributed(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())

    import jax.numpy as jnp
    import naqs_tpu as nq
    from naqs_tpu.models.nade import NAQSConfig, init_params
    from naqs_tpu.ops.local_energy import DeviceTerms
    from naqs_tpu.parallel import make_mesh, make_sharded_train_step
    from naqs_tpu.trainer import TrainConfig

    mol = nq.load_molecule("H2")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(
        n_qubits=mol.n_qubits, sectors=h.sectors,
        amp_hidden=(8,), phase_hidden=(8,), masking="partial",
    )
    tc = TrainConfig(use_lr_schedule=False)
    opt = tc.make_optimizer()
    mesh = make_mesh()  # global mesh over all 4 devices
    step = make_sharded_train_step(cfg, opt, mesh, capacity_per_device=8)

    # identical on every process -> valid replicated global arrays
    params = init_params(jax.random.key(0), cfg)
    opt_state = opt.init(params)
    dt = DeviceTerms.from_terms(terms, hilbert=h)
    keys = device_key_shard(jax.random.key(1), mesh)
    params, opt_state, metrics = step(
        params, opt_state, dt, keys, jnp.float64(1e4)
    )
    e = float(metrics["e_loc"])
    nu = int(metrics["n_unique"])
    assert -2.0 < e < 0.0, e
    assert 0 < nu <= 4, nu
    print(f"MULTIHOST_OK {e:.6f} {nu}", flush=True)


if __name__ == "__main__":
    main()
