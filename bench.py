"""Headline benchmark: local-energy throughput (states/sec/chip) on N2 sto-3g.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is the speedup over the reference-equivalent CPU path (a
vectorized numpy implementation of the reference's Cython+SciPy local-energy
pipeline, naqs_tpu.hamiltonian.local_energy_np) measured on this host.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import naqs_tpu as nq
    from naqs_tpu.hamiltonian import local_energy_np
    from naqs_tpu.models.nade import NAQSConfig, init_params, log_psi
    from naqs_tpu.ops.local_energy import DeviceTerms, local_energy

    mol = nq.load_molecule("N2")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    dt = DeviceTerms.from_terms(terms, hilbert=h)

    M = 8192
    rng = np.random.default_rng(0)
    sub = np.sort(rng.choice(h.size, size=M, replace=False))
    states_np = h.basis[sub]
    log_amp_np = rng.normal(scale=1.0, size=M)
    log_amp_np -= log_amp_np.max()
    phase_np = rng.uniform(0, 2 * np.pi, size=M)

    states = jnp.asarray(states_np)
    la = jnp.asarray(log_amp_np, dtype=jnp.float32)
    ph = jnp.asarray(phase_np, dtype=jnp.float32)

    f = jax.jit(lambda s, a, p: local_energy(dt, s, a, p, jnp.int32(M)))
    f(states, la, ph)[0].block_until_ready()  # compile
    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        e_re, e_im = f(states, la, ph)
    e_re.block_until_ready()
    dt_dev = (time.perf_counter() - t0) / n_iter
    rate_dev = M / dt_dev

    # reference-equivalent CPU baseline (numpy, full vectorization)
    m_cpu = 1024
    psi = np.exp(log_amp_np[:m_cpu] + 1j * phase_np[:m_cpu])
    t0 = time.perf_counter()
    e_np = local_energy_np(terms, states_np[:m_cpu], psi)
    dt_cpu = time.perf_counter() - t0
    rate_cpu = m_cpu / dt_cpu

    # correctness cross-check on the overlapping prefix
    psi_full = np.exp(log_amp_np + 1j * phase_np)
    e_np_full = local_energy_np(terms, states_np, psi_full)
    err = float(np.max(np.abs(np.asarray(e_re) - e_np_full.real)))
    assert err < 1e-3, f"device/oracle mismatch: {err}"

    print(
        json.dumps(
            {
                "metric": "N2_local_energy_states_per_sec_per_chip",
                "value": round(rate_dev, 1),
                "unit": "states/s",
                "vs_baseline": round(rate_dev / rate_cpu, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
