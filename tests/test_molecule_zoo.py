"""Every molecule in the zoo loads, compiles, and has a correct HF diagonal.

<HF|H|HF> == stored SCF energy validates the whole data path (hdf5 load,
pickle decode, JW mask compilation, parity/sign conventions) per system
without needing the full basis.
"""

import os

import numpy as np
import pytest

import naqs_tpu as nq
from naqs_tpu.hamiltonian import diagonal_energy_np

MOL_ROOT = "/root/reference/molecules"


def _all_molecules():
    out = []
    for root, dirs, files in os.walk(MOL_ROOT):
        for f in files:
            if f.endswith(".hdf5"):
                out.append(os.path.relpath(root, MOL_ROOT))
                break
    return sorted(out)


@pytest.mark.parametrize("rel", _all_molecules())
def test_molecule_loads_and_hf_diagonal(rel):
    mol = nq.load_molecule(os.path.join(MOL_ROOT, rel))
    assert mol.qubit_hamiltonian, rel
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    h = nq.Hilbert.for_molecule(mol)
    e_hf = diagonal_energy_np(terms, np.array([h.hf_state()]))[0]
    assert mol.hf_energy is not None
    assert abs(e_hf - mol.hf_energy) < 1e-4, (rel, e_hf, mol.hf_energy)
    # basis enumeration for moderate spaces
    if h.size <= 300_000:
        basis = h.basis
        assert len(basis) == h.size
        na, nb = h.sector_counts(basis[:100])
        sector_set = set(h.sectors)
        assert all((int(a), int(b)) in sector_set for a, b in zip(na, nb))


@pytest.mark.slow
def test_widest_system_h2_ccpvtz():
    """56 qubits (28 shells): packed-u64 and uint32-frontier limits hold."""
    import jax
    import jax.numpy as jnp

    from naqs_tpu.models.nade import NAQSConfig, init_params, log_psi
    from naqs_tpu.sampler import sample

    mol = nq.load_molecule(os.path.join(MOL_ROOT, "H2_cc-pvtz"))
    h = nq.Hilbert.for_molecule(mol)
    assert mol.n_qubits == 56 and h.size == 784
    cfg = NAQSConfig(n_qubits=56, sectors=h.sectors, amp_hidden=(8,),
                     phase_hidden=(8,), masking="full")
    params = init_params(jax.random.key(0), cfg)
    la, _ = log_psi(cfg, params, jnp.asarray(h.basis))
    assert abs(float(jnp.sum(jnp.exp(2 * la.astype(jnp.float64)))) - 1.0) < 1e-3
    b = sample(cfg, params, jax.random.key(1), jnp.float64(1e4), 512)
    nu = int(b.n_unique)
    assert nu > 0 and np.all(h.contains(np.asarray(b.states[:nu])))
