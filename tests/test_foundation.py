"""Foundation tests: bit ops, molecule I/O, term compilation, Hilbert basis.

Golden values (term counts, basis sizes, reference energies) come from the
upstream data files; see SURVEY.md section 6 / BASELINE.md.
"""

import numpy as np
import pytest

from naqs_tpu import Hilbert, compile_pauli_terms, load_molecule
from naqs_tpu.utils import bits


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    b = rng.integers(0, 2, size=(17, 20))
    packed = bits.np_pack_bits(b)
    assert packed.dtype == np.uint64
    np.testing.assert_array_equal(bits.np_unpack_bits(packed, 20), b)

    import jax.numpy as jnp

    jp = bits.pack_bits(jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(jp), packed)
    np.testing.assert_array_equal(np.asarray(bits.unpack_bits(jp, 20)), b)


def test_parity_matches_reference_oracle():
    # reference oracle: src/optimizer/hamiltonian.py:19-30 (32-bit popcount)
    def ref_parity(i):
        i = np.asarray(i, dtype=np.uint64)
        c = np.bitwise_count(i).astype(np.int64)
        return 1 - 2 * (c % 2)

    rng = np.random.default_rng(1)
    x = rng.integers(0, 2**63, size=1000, dtype=np.uint64)
    np.testing.assert_array_equal(bits.np_parity_pm1(x), ref_parity(x))

    import jax.numpy as jnp

    np.testing.assert_array_equal(np.asarray(bits.parity_pm1(jnp.asarray(x))), ref_parity(x))


@pytest.mark.parametrize(
    "name,n_terms,n_qubits,n_elec",
    [("H2", 15, 4, 2), ("LiH", 631, 12, 4), ("H2O", 1390, 14, 10), ("N2", 2239, 20, 14)],
)
def test_molecule_and_term_counts(name, n_terms, n_qubits, n_elec):
    mol = load_molecule(name)
    assert mol.n_qubits == n_qubits
    assert mol.n_electrons == n_elec
    assert mol.qubit_hamiltonian is not None
    assert len(mol.qubit_hamiltonian) == n_terms
    terms = compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    # every raw term lands in exactly one compiled slot (pre-merge)
    assert terms.n_terms <= n_terms
    assert np.all(terms.xy != 0)
    assert np.all(terms.xy_unique[1:] > terms.xy_unique[:-1])


def test_hilbert_sizes():
    # size = C(S, n_alpha) * C(S, n_beta)   (reference: hilbert.py:393)
    for name, expect in [("H2", 4), ("LiH", 225), ("H2O", 441), ("N2", 14400)]:
        mol = load_molecule(name, load_hamiltonian=False)
        h = Hilbert.for_molecule(mol)
        assert h.size == expect
        assert len(h.basis) == expect
        assert np.all(h.basis[1:] > h.basis[:-1])
        na, nb = h.sector_counts(h.basis)
        assert np.all(na == mol.n_alpha_electrons)
        assert np.all(nb == mol.n_beta_electrons)
        # HF state is in the basis and is its minimum element
        hf = h.hf_state()
        assert h.contains(np.array([hf]))[0]
        assert h.basis[0] == hf


def test_hilbert_multi_sector_open_shell():
    mol = load_molecule("O2", load_hamiltonian=False)  # triplet, 16 e-, 20 qubits
    assert mol.multiplicity == 3
    h_ms = Hilbert.for_molecule(mol, restrict_to_ms=True)
    assert h_ms.sectors == ((9, 7),)
    h_all = Hilbert.for_molecule(mol, restrict_to_ms=False)
    assert set(h_all.sectors) == {(7, 9), (8, 8), (9, 7)}
    from math import comb

    assert h_all.size == sum(comb(10, a) * comb(10, b) for a, b in h_all.sectors)


def test_state_index_roundtrip():
    mol = load_molecule("LiH", load_hamiltonian=False)
    h = Hilbert.for_molecule(mol)
    idx = np.arange(h.size)
    states = h.index_to_state(idx)
    np.testing.assert_array_equal(h.state_to_index(states), idx)
    # a state with wrong electron count is not in the basis
    bad = np.array([0], dtype=np.uint64)
    assert h.state_to_index(bad)[0] == -1
