"""Tests for the S^2 operator and spin-resolved eigenstate selection."""

import numpy as np

import naqs_tpu as nq
from naqs_tpu.hamiltonian import assemble_sparse_hamiltonian_np
from naqs_tpu.utils.spin import (
    lowest_eig_with_spin, penalized_termdict, s_squared_sparse)


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


def test_penalized_termdict_assembles_to_h_plus_lam_s2():
    """compile(H_td + lam*S2_td) must equal assemble(H) + lam * S2 exactly
    (matrix identity over a sector basis) — validates the -s2_penalty
    training operator end to end through the term compiler."""
    lam = 0.7
    mol = nq.load_molecule("LiH")
    h = nq.Hilbert.for_molecule(mol)
    basis = np.sort(np.asarray(h.basis, dtype=np.uint64))
    td = penalized_termdict(mol.qubit_hamiltonian, mol.n_qubits, lam)
    terms_p = nq.compile_pauli_terms(td, mol.n_qubits)
    Hp = assemble_sparse_hamiltonian_np(terms_p, basis).toarray()
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    H = assemble_sparse_hamiltonian_np(terms, basis).toarray()
    S2 = s_squared_sparse(basis, mol.n_qubits).toarray()
    assert np.abs(Hp - (H + lam * S2)).max() < 1e-9
    # spectrum property the penalty run relies on: every singlet eigenvalue
    # is unchanged, every contaminant is lifted by lam * s(s+1)
    w, v = np.linalg.eigh(H)
    s2_diag = np.einsum("ij,ij->j", v, S2 @ v)
    wp = np.linalg.eigvalsh(Hp)
    assert np.abs(np.sort(w + lam * s2_diag) - wp).max() < 1e-8
