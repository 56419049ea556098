"""Standalone Jordan-Wigner pipeline vs the shipped qubit-Hamiltonian pickles."""

import numpy as np
import pytest

import naqs_tpu as nq
from naqs_tpu.hamiltonian import assemble_dense_hamiltonian_np
from naqs_tpu.jw import jordan_wigner_from_integrals


@pytest.mark.parametrize("name", ["H2", "LiH"])
def test_jw_matches_pickled_hamiltonian(name):
    mol = nq.load_molecule(name)
    jw = jordan_wigner_from_integrals(
        mol.one_body_integrals, mol.two_body_integrals, mol.nuclear_repulsion
    )
    assert len(jw) == len(mol.qubit_hamiltonian)
    h = nq.Hilbert.for_molecule(mol)
    t_ours = nq.compile_pauli_terms(jw, mol.n_qubits)
    t_ref = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    h_ours = assemble_dense_hamiltonian_np(t_ours, h.basis)
    h_ref = assemble_dense_hamiltonian_np(t_ref, h.basis)
    np.testing.assert_allclose(h_ours, h_ref, atol=1e-12)
    e0 = np.linalg.eigvalsh(h_ours)[0]
    assert abs(e0 - mol.fci_energy) < 2e-6


def test_molecule_loader_jw_fallback(tmp_path):
    """hdf5 without a pickle must transparently build terms from integrals."""
    import os
    import shutil

    src = "/root/reference/molecules/H2/H2.hdf5"
    md = tmp_path / "H2"
    md.mkdir()
    shutil.copy(src, md)
    mol = nq.load_molecule(str(md))
    assert mol.qubit_hamiltonian is not None
    assert len(mol.qubit_hamiltonian) == 15
