"""Native C++ host kernels vs pure-numpy oracles."""

import numpy as np
import pytest

import naqs_tpu as nq
from naqs_tpu import native
from naqs_tpu.hamiltonian import local_energy_np


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built (no g++?)"
)


def _setup(name="LiH"):
    mol = nq.load_molecule(name)
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    return mol, h, terms


def test_enumerate_combinations_matches_itertools():
    import itertools
    from math import comb

    w = (np.uint64(1) << (2 * np.arange(6, dtype=np.uint64)))
    fast = native.enumerate_combinations(6, 3, w)
    slow = np.fromiter(
        (np.uint64(sum(int(w[p]) for p in pos))
         for pos in itertools.combinations(range(6), 3)),
        dtype=np.uint64, count=comb(6, 3),
    )
    np.testing.assert_array_equal(np.sort(fast), np.sort(slow))


def test_assemble_h_matches_numpy():
    import scipy.sparse as sp

    mol, h, terms = _setup("H2O")
    rows, cols, vals = native.assemble_h_coo(terms, h.basis)
    H_native = sp.csr_matrix((vals, (rows, cols)), shape=(h.size, h.size))
    # independent numpy assembly (dense; H2O basis is 441)
    from naqs_tpu.hamiltonian import assemble_dense_hamiltonian_np

    H_np = assemble_dense_hamiltonian_np(terms, h.basis)
    np.testing.assert_allclose(H_native.toarray(), H_np, atol=1e-12)


def test_native_local_energy_matches_numpy():
    mol, h, terms = _setup("LiH")
    rng = np.random.default_rng(0)
    m = 150
    states = np.sort(rng.choice(h.basis, size=m, replace=False))
    psi = np.exp(rng.normal(size=m) + 1j * rng.uniform(0, 6, size=m))
    e_native = native.local_energy_host(terms, states, psi)
    e_np = local_energy_np(terms, states, psi)
    np.testing.assert_allclose(e_native, e_np, atol=1e-10)


def test_csr_matvec_matches_scipy():
    import scipy.sparse as sp

    mol, h, terms = _setup("LiH")
    from naqs_tpu.hamiltonian import assemble_sparse_hamiltonian_np

    H = assemble_sparse_hamiltonian_np(terms, h.basis)
    rng = np.random.default_rng(1)
    x = rng.normal(size=h.size) + 1j * rng.normal(size=h.size)
    y_native = native.csr_matvec_complex(H, x)
    np.testing.assert_allclose(y_native, H @ x, atol=1e-10)


def test_blocked_assembly_matches_single_shot():
    """Row-blocked assembly (bounded COO staging memory, required for
    million-state bases) must produce the identical CSR matrix."""
    import numpy as np

    import naqs_tpu as nq
    from naqs_tpu.hamiltonian import assemble_sparse_hamiltonian_np

    mol = nq.load_molecule("LiH")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    basis = np.sort(np.asarray(h.basis, dtype=np.uint64))
    H1 = assemble_sparse_hamiltonian_np(terms, basis)
    H2 = assemble_sparse_hamiltonian_np(terms, basis, row_block=37)
    assert abs(H1 - H2).max() < 1e-14

    from naqs_tpu import native
    lib, tried = native._lib, native._tried
    try:  # force the numpy fallback path through the same block logic
        native._lib, native._tried = None, True
        H3 = assemble_sparse_hamiltonian_np(terms, basis, row_block=50)
    finally:
        native._lib, native._tried = lib, tried
    assert abs(H1 - H3).max() < 1e-12


def test_hamiltonian_linear_operator_matches_csr():
    import numpy as np
    from scipy.sparse.linalg import eigsh

    import naqs_tpu as nq
    from naqs_tpu.hamiltonian import (
        assemble_sparse_hamiltonian_np, hamiltonian_linear_operator)

    mol = nq.load_molecule("LiH")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    basis = np.sort(np.asarray(h.basis, dtype=np.uint64))
    H = assemble_sparse_hamiltonian_np(terms, basis)
    op = hamiltonian_linear_operator(terms, basis, row_block=41)
    rng = np.random.default_rng(0)
    x = rng.normal(size=len(basis))
    assert np.abs(op @ x - H @ x).max() < 1e-12
    e_op = float(eigsh(op, k=1, which="SA")[0][0])
    assert abs(e_op - mol.fci_energy) < 1e-8
