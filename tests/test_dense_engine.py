"""Dense sector-grid engine vs the numpy reference-equivalent oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

import naqs_tpu as nq
from naqs_tpu.hamiltonian import local_energy_np
from naqs_tpu.ops.dense_engine import DenseTerms, dense_local_energy
from naqs_tpu.ops.rank import RankSpec


def _setup(name):
    mol = nq.load_molecule(name)
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    assert DenseTerms.supported(terms, h)
    dn = DenseTerms.build(terms, h)
    spec = RankSpec.for_hilbert(h)
    return mol, h, terms, dn, spec


@pytest.mark.parametrize("name,m", [("LiH", 100), ("H2O", 300)])
def test_dense_matches_numpy_subset(name, m):
    mol, h, terms, dn, spec = _setup(name)
    rng = np.random.default_rng(0)
    sub = np.sort(rng.choice(h.size, size=m, replace=False))
    states = h.basis[sub]
    la = rng.normal(scale=1.0, size=m)
    la -= la.max()
    ph = rng.uniform(0, 2 * np.pi, size=m)

    # SENTINEL-padded buffer wider than the sample
    cap = m + 28
    buf = np.full((cap,), np.uint64(2**64 - 1), np.uint64)
    buf[:m] = states
    la_b = np.zeros(cap, np.float32)
    la_b[:m] = la
    ph_b = np.zeros(cap, np.float32)
    ph_b[:m] = ph

    e_re, e_im = dense_local_energy(
        dn, spec, jnp.asarray(buf), jnp.asarray(la_b), jnp.asarray(ph_b),
        jnp.int32(m))

    psi = np.exp(la + 1j * ph)
    e_np = local_energy_np(terms, states, psi)
    np.testing.assert_allclose(
        np.asarray(e_re)[:m], e_np.real, atol=2e-4, rtol=0)
    np.testing.assert_allclose(
        np.asarray(e_im)[:m], e_np.imag, atol=2e-4, rtol=0)


def test_dense_full_space_matches_numpy():
    mol, h, terms, dn, spec = _setup("LiH")
    n = h.size
    rng = np.random.default_rng(1)
    la = (rng.normal(scale=1.0, size=n) - 2.0).astype(np.float64)
    la -= la.max()
    ph = rng.uniform(0, 2 * np.pi, size=n)
    e_re, e_im = dense_local_energy(
        dn, spec, jnp.asarray(h.basis), jnp.asarray(la, dtype=jnp.float32),
        jnp.asarray(ph, dtype=jnp.float32), jnp.int32(n))
    psi = np.exp(la + 1j * ph)
    e_np = local_energy_np(terms, h.basis, psi)
    np.testing.assert_allclose(np.asarray(e_re), e_np.real, atol=2e-4)
    np.testing.assert_allclose(np.asarray(e_im), e_np.imag, atol=2e-4)


def test_dense_agrees_with_rank_engine():
    """Same inputs through both engines (including padding rows)."""
    from naqs_tpu.ops.local_energy import DeviceTerms, local_energy

    mol, h, terms, dn, spec = _setup("LiH")
    dt = DeviceTerms.from_terms(terms, hilbert=h)
    m = 60
    rng = np.random.default_rng(2)
    sub = np.sort(rng.choice(h.size, size=m, replace=False))
    cap = 64
    buf = np.full((cap,), np.uint64(2**64 - 1), np.uint64)
    buf[:m] = h.basis[sub]
    la = np.zeros(cap, np.float32)
    la[:m] = rng.normal(size=m) - 1.0
    ph = np.zeros(cap, np.float32)
    ph[:m] = rng.uniform(0, 2 * np.pi, size=m)
    args = (jnp.asarray(buf), jnp.asarray(la), jnp.asarray(ph), jnp.int32(m))
    e1_re, e1_im = local_energy(dt, *args)
    e2_re, e2_im = dense_local_energy(dn, spec, *args)
    np.testing.assert_allclose(
        np.asarray(e1_re)[:m], np.asarray(e2_re)[:m], atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(e1_im)[:m], np.asarray(e2_im)[:m], atol=2e-4)


@pytest.mark.parametrize("name,m", [("LiH", 80), ("H2O", 250)])
def test_factored_matches_numpy(name, m):
    """FactorTerms is built for mid-size spaces, but the code path is
    size-independent -- verify it on small molecules against the oracle."""
    from naqs_tpu.ops.dense_engine import FactorTerms, factored_local_energy

    mol, h, terms, dn, spec = _setup(name)
    assert FactorTerms.supported(terms, h)
    fn = FactorTerms.build(terms, h)
    rng = np.random.default_rng(7)
    sub = np.sort(rng.choice(h.size, size=m, replace=False))
    cap = m + 12
    buf = np.full((cap,), np.uint64(2**64 - 1), np.uint64)
    buf[:m] = h.basis[sub]
    la = np.zeros(cap, np.float32)
    la[:m] = rng.normal(size=m) - 1.0
    ph = np.zeros(cap, np.float32)
    ph[:m] = rng.uniform(0, 2 * np.pi, size=m)
    e_re, e_im = factored_local_energy(
        fn, spec, jnp.asarray(buf), jnp.asarray(la), jnp.asarray(ph),
        jnp.int32(m))
    psi = np.exp(la[:m].astype(np.float64) + 1j * ph[:m].astype(np.float64))
    e_np = local_energy_np(terms, buf[:m], psi)
    np.testing.assert_allclose(np.asarray(e_re)[:m], e_np.real, atol=2e-4)
    np.testing.assert_allclose(np.asarray(e_im)[:m], e_np.imag, atol=2e-4)
