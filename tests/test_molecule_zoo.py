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
