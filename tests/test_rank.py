"""Combinadic rank addressing (ops/rank.py): bijection + engine equivalence.

The rank path replaces the reference's dense 2^N full->restricted LUT
(reference src/utils/hilbert.py:429-439) with O(N) arithmetic; these tests
pin (a) that rank_index is a bijection onto [0, size) over the restricted
basis, (b) that invalid states hit the sentinel, and (c) that the rank-based
local-energy/exact-energy paths agree with the sort-based fallback and the
numpy oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from naqs_tpu import Hilbert, compile_pauli_terms, load_molecule
from naqs_tpu.hamiltonian import local_energy_np
from naqs_tpu.ops.local_energy import DeviceTerms, local_energy, quadratic_energy
from naqs_tpu.ops.rank import RankSpec, np_rank_index, rank_index
from naqs_tpu.utils.bits import SENTINEL


@pytest.mark.parametrize(
    "sectors,n_qubits",
    [
        (((2, 2),), 12),           # LiH-like closed shell
        (((5, 5),), 14),           # H2O-like
        (((9, 7),), 20),           # O2 fixed-m_s open shell
        (((5, 3), (4, 4), (3, 5)), 14),  # multi-sector partially restricted
    ],
)
def test_rank_is_bijection_on_basis(sectors, n_qubits):
    h = Hilbert(n_qubits=n_qubits, sectors=sectors)
    spec = RankSpec.for_hilbert(h)
    assert spec is not None
    idx_np = np_rank_index(spec, h.basis)
    assert idx_np.min() == 0 and idx_np.max() == h.size - 1
    assert len(np.unique(idx_np)) == h.size
    idx_dev = np.asarray(rank_index(spec, jnp.asarray(h.basis)))
    np.testing.assert_array_equal(idx_dev, idx_np)


def test_invalid_states_hit_sentinel():
    h = Hilbert(n_qubits=12, sectors=((2, 2),))
    spec = RankSpec.for_hilbert(h)
    rng = np.random.default_rng(0)
    basis_set = set(h.basis.tolist())
    invalid = np.array(
        [x for x in rng.integers(0, 2**12, size=400) if x not in basis_set],
        dtype=np.uint64,
    )
    idx = np.asarray(rank_index(spec, jnp.asarray(invalid)))
    assert (idx == spec.size).all()
    np.testing.assert_array_equal(np_rank_index(spec, invalid), idx)


def test_unsupported_spaces_return_none():
    h = Hilbert(n_qubits=56, sectors=((1, 1),))  # H2 cc-pVTZ width
    assert RankSpec.for_hilbert(h) is None


@pytest.mark.parametrize("name", ["LiH", "H2O", "O2"])
def test_rank_engine_matches_oracle_and_fallback(name):
    mol = load_molecule(name)
    h = Hilbert.for_molecule(mol)
    terms = compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    rng = np.random.default_rng(7)
    m = min(300, h.size)
    sub = np.sort(rng.choice(h.size, size=m, replace=False))
    states = h.basis[sub]
    log_amp = rng.normal(size=m)
    log_amp -= log_amp.max()
    phase = rng.uniform(0, 2 * np.pi, size=m)
    psi = np.exp(log_amp + 1j * phase)

    e_np = local_energy_np(terms, states, psi)

    cap = m + 9
    states_p = np.full(cap, SENTINEL, dtype=np.uint64)
    states_p[:m] = states
    la = np.zeros(cap, np.float32)
    la[:m] = log_amp
    ph = np.zeros(cap, np.float32)
    ph[:m] = phase
    args = (jnp.asarray(states_p), jnp.asarray(la), jnp.asarray(ph), jnp.int32(m))

    dt_rank = DeviceTerms.from_terms(terms, hilbert=h)
    assert dt_rank.rank_spec is not None
    e_re, e_im = local_energy(dt_rank, *args)
    np.testing.assert_allclose(np.asarray(e_re[:m]), e_np.real, atol=5e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(e_im[:m]), e_np.imag, atol=5e-4, rtol=1e-5)

    dt_sort = DeviceTerms.from_terms(terms)
    e_re2, _ = local_energy(dt_sort, *args)
    np.testing.assert_allclose(
        np.asarray(e_re[:m]), np.asarray(e_re2[:m]), atol=1e-5, rtol=1e-6
    )


def test_rank_quadratic_energy_matches_fallback_and_grad():
    mol = load_molecule("LiH")
    h = Hilbert.for_molecule(mol)
    terms = compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    rng = np.random.default_rng(3)
    m = min(400, h.size)
    sub = np.sort(rng.choice(h.size, size=m, replace=False))
    states = jnp.asarray(h.basis[sub])
    la = jnp.asarray(rng.normal(size=m), jnp.float32)
    ph = jnp.asarray(rng.uniform(0, 2 * np.pi, size=m), jnp.float32)
    nv = jnp.int32(m)

    dt_rank = DeviceTerms.from_terms(terms, hilbert=h)
    dt_sort = DeviceTerms.from_terms(terms)
    e_rank = float(quadratic_energy(dt_rank, states, la, ph, nv))
    e_sort = float(quadratic_energy(dt_sort, states, la, ph, nv))
    assert abs(e_rank - e_sort) < 1e-5

    g_rank = jax.grad(
        lambda a: quadratic_energy(dt_rank, states, a, ph, nv)
    )(la)
    g_sort = jax.grad(
        lambda a: quadratic_energy(dt_sort, states, a, ph, nv)
    )(la)
    np.testing.assert_allclose(
        np.asarray(g_rank), np.asarray(g_sort), atol=1e-5, rtol=1e-4
    )


def test_full_n_up_hilbert_and_rank():
    """Unrestricted (-no_restrictedH) space: all spin splits of the total
    electron count; the rank address space covers every sector."""
    h = Hilbert.full_n_up(12, 4)
    from math import comb
    assert h.size == sum(comb(6, na) * comb(6, 4 - na) for na in range(0, 5))
    spec = RankSpec.for_hilbert(h)
    idx = np_rank_index(spec, h.basis)
    assert len(np.unique(idx)) == h.size and idx.max() == h.size - 1
    # per-spin-restricted states are a strict subset
    h_r = Hilbert(n_qubits=12, sectors=((2, 2),))
    assert h_r.size < h.size
    assert np.isin(h_r.basis, h.basis).all()


def test_n_exc_max_filters_basis():
    """N_exc_max subspace (reference hilbert.py:269-271): at most k electrons
    above the lowest n_electrons spin-orbitals."""
    h_full = Hilbert(n_qubits=12, sectors=((2, 2),))
    h_exc = Hilbert(n_qubits=12, sectors=((2, 2),), n_exc_max=1)
    assert 0 < h_exc.size < h_full.size
    assert (h_exc.excitation_count(h_exc.basis) <= 1).all()
    # HF determinant (zero excitations) is always included
    assert np.uint64(h_exc.hf_state()) in h_exc.basis
    # rank addressing still works over the (holey) sector address space
    spec = RankSpec.for_hilbert(h_exc)
    assert spec.size == h_exc.sector_size
    idx = np_rank_index(spec, h_exc.basis)
    assert len(np.unique(idx)) == h_exc.size and idx.max() < spec.size


def test_rank_supports_li2o_scale_space():
    """Li2O (30 qubits, (7,7) sector, 41.4M states) is the largest shipped
    rank-addressable space; verify injectivity on a sample without
    materializing the basis."""
    h = Hilbert(n_qubits=30, sectors=((7, 7),))
    spec = RankSpec.for_hilbert(h)
    assert spec is not None and spec.size == 6435 ** 2
    rng = np.random.default_rng(1)
    # random valid states: choose 7 alpha and 7 beta positions
    n = 20000
    states = np.zeros(n, dtype=np.uint64)
    for i in range(n):
        a = rng.choice(15, size=7, replace=False)
        b = rng.choice(15, size=7, replace=False)
        states[i] = (np.sum(1 << (2 * a.astype(np.uint64)))
                     + np.sum(1 << (2 * b.astype(np.uint64) + 1)))
    states = np.unique(states)
    idx_np = np_rank_index(spec, states)
    assert idx_np.max() < spec.size and idx_np.min() >= 0
    assert len(np.unique(idx_np)) == len(states)  # injective
    idx_dev = np.asarray(rank_index(spec, jnp.asarray(states)))
    np.testing.assert_array_equal(idx_dev, idx_np)
