"""Physics gate: our assembled Hamiltonian reproduces the stored FCI energies.

This is the reference's own correctness check (experiments/_base.py:250-262):
exact diagonalization of the restricted-space Hamiltonian must match the
Psi4 FCI energy stored in the molecule hdf5.
"""

import numpy as np
import pytest

from naqs_tpu import Hilbert, compile_pauli_terms, load_molecule
from naqs_tpu.hamiltonian import (
    assemble_dense_hamiltonian_np,
    assemble_sparse_hamiltonian_np,
    diagonal_energy_np,
    local_energy_np,
)


@pytest.mark.parametrize("name", ["H2", "LiH", "H2O"])
def test_exact_ground_state_matches_fci(name):
    mol = load_molecule(name)
    h = Hilbert.for_molecule(mol)
    terms = compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    H = assemble_sparse_hamiltonian_np(terms, h.basis)
    # symmetry check
    d = (H - H.T).tocoo()
    assert np.max(np.abs(d.data)) < 1e-10 if d.nnz else True

    from scipy.sparse.linalg import eigsh

    e0 = eigsh(H, k=1, which="SA")[0][0]
    assert abs(e0 - mol.fci_energy) < 2e-6, (e0, mol.fci_energy)


def test_dense_sparse_assembly_agree():
    mol = load_molecule("LiH")
    h = Hilbert.for_molecule(mol)
    terms = compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    Hd = assemble_dense_hamiltonian_np(terms, h.basis)
    Hs = assemble_sparse_hamiltonian_np(terms, h.basis).toarray()
    np.testing.assert_allclose(Hd, Hs, atol=1e-12)


def test_hf_diagonal_matches_hf_energy():
    # <HF|H|HF> equals the stored SCF energy
    for name in ["H2", "LiH", "H2O", "N2"]:
        mol = load_molecule(name)
        h = Hilbert.for_molecule(mol)
        terms = compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
        e_hf = diagonal_energy_np(terms, np.array([h.hf_state()]))[0]
        assert abs(e_hf - mol.hf_energy) < 5e-6, (name, e_hf, mol.hf_energy)


def test_local_energy_oracle_consistency():
    # E_loc over the FULL basis with exact eigenvector psi must equal E0 per state
    mol = load_molecule("H2")
    h = Hilbert.for_molecule(mol)
    terms = compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    H = assemble_dense_hamiltonian_np(terms, h.basis)
    w, v = np.linalg.eigh(H)
    psi = v[:, 0].astype(np.complex128)
    e_loc = local_energy_np(terms, h.basis, psi)
    sel = np.abs(psi) > 1e-8  # E_loc undefined where psi ~ 0
    np.testing.assert_allclose(e_loc.real[sel], w[0], atol=1e-9)
    np.testing.assert_allclose(e_loc.imag[sel], 0.0, atol=1e-9)


def test_freeze_core_matches_projected_hamiltonian():
    from naqs_tpu import Hilbert
    from naqs_tpu.hamiltonian import freeze_core

    mol = load_molecule("LiH")
    terms = compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    n_occ = 2
    ft = freeze_core(terms, n_occ)
    assert ft.n_qubits == mol.n_qubits - n_occ
    h_red = Hilbert(n_qubits=mol.n_qubits - n_occ, sectors=((1, 1),))
    frozen_bits = np.uint64((1 << n_occ) - 1)
    basis_full = np.sort((h_red.basis << np.uint64(n_occ)) | frozen_bits)
    H_full = assemble_dense_hamiltonian_np(terms, basis_full)
    H_red = assemble_dense_hamiltonian_np(ft, h_red.basis)
    np.testing.assert_allclose(H_red, H_full, atol=1e-12)
    # frozen-core ground state is variational wrt full FCI
    e_red = np.linalg.eigvalsh(H_red)[0]
    assert mol.fci_energy < e_red < mol.fci_energy + 5e-3
