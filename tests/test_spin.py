"""Tests for the S^2 operator and spin-resolved eigenstate selection."""

import numpy as np

import naqs_tpu as nq
from naqs_tpu.hamiltonian import assemble_sparse_hamiltonian_np
from naqs_tpu.utils.spin import lowest_eig_with_spin, s_squared_sparse


def test_s_squared_spectrum_is_integral_on_lih_sector():
    mol = nq.load_molecule("LiH")
    h = nq.Hilbert.for_molecule(mol)
    basis = np.sort(np.asarray(h.basis, dtype=np.uint64))
    s2 = s_squared_sparse(basis, mol.n_qubits)
    # S^2 must be Hermitian with eigenvalues s(s+1) for integer s in an
    # S_z = 0 sector: {0, 2, 6, ...}
    asym = (s2 - s2.T).tocoo()
    assert asym.nnz == 0 or np.abs(asym.data).max() < 1e-10
    w = np.linalg.eigvalsh(s2.toarray())
    allowed = np.array([0.0, 2.0, 6.0, 12.0, 20.0, 30.0])
    d = np.abs(w[:, None] - allowed[None, :]).min(axis=1)
    assert d.max() < 1e-8


def test_singlet_selection_matches_fci_on_lih():
    mol = nq.load_molecule("LiH")
    h = nq.Hilbert.for_molecule(mol)
    basis = np.sort(np.asarray(h.basis, dtype=np.uint64))
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    H = assemble_sparse_hamiltonian_np(terms, basis)
    e, vec, s2_list, idx = lowest_eig_with_spin(
        H, basis, mol.n_qubits, target_s2=0.0, k=6)
    assert idx == 0  # LiH ground state is a singlet
    assert abs(e - mol.fci_energy) < 1e-8
    assert abs(s2_list[0]) < 1e-6
    # and the first excited state in the sector is a triplet component
    assert abs(s2_list[1] - 2.0) < 1e-6
