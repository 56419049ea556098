"""Device local-energy engine vs host numpy oracle and exact physics."""

import numpy as np
import jax.numpy as jnp
import pytest

from naqs_tpu import Hilbert, compile_pauli_terms, load_molecule
from naqs_tpu.hamiltonian import (
    assemble_sparse_hamiltonian_np,
    local_energy_np,
)
from naqs_tpu.ops.local_energy import DeviceTerms, expectation_energy, local_energy
from naqs_tpu.utils.bits import SENTINEL


def _setup(name):
    mol = load_molecule(name)
    h = Hilbert.for_molecule(mol)
    terms = compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    return mol, h, terms


def _random_psi(rng, n):
    log_amp = rng.normal(scale=1.0, size=n)
    log_amp -= log_amp.max()
    phase = rng.uniform(0, 2 * np.pi, size=n)
    psi = np.exp(log_amp + 1j * phase)
    return log_amp, phase, psi


@pytest.mark.parametrize("name", ["H2", "LiH", "H2O"])
def test_device_matches_numpy_oracle(name):
    mol, h, terms = _setup(name)
    rng = np.random.default_rng(42)
    # random subset of the basis (sorted), random psi
    m = min(200, h.size)
    sub = np.sort(rng.choice(h.size, size=m, replace=False))
    states = h.basis[sub]
    log_amp, phase, psi = _random_psi(rng, m)

    e_np = local_energy_np(terms, states, psi)

    dt = DeviceTerms.from_terms(terms)
    # pad buffer to a capacity > m to exercise padding
    cap = m + 13
    states_p = np.full(cap, SENTINEL, dtype=np.uint64)
    states_p[:m] = states
    la = np.zeros(cap, dtype=np.float32)
    la[:m] = log_amp
    ph = np.zeros(cap, dtype=np.float32)
    ph[:m] = phase
    e_re, e_im = local_energy(
        dt, jnp.asarray(states_p), jnp.asarray(la), jnp.asarray(ph), jnp.int32(m)
    )
    # f32 phases/logs upstream: tolerate ~1e-4 absolute
    np.testing.assert_allclose(np.asarray(e_re[:m]), e_np.real, atol=5e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(e_im[:m]), e_np.imag, atol=5e-4, rtol=1e-5)


def test_exact_expectation_matches_rayleigh_quotient():
    mol, h, terms = _setup("LiH")
    H = assemble_sparse_hamiltonian_np(terms, h.basis).toarray()
    rng = np.random.default_rng(7)
    log_amp, phase, psi = _random_psi(rng, h.size)
    w = np.abs(psi) ** 2
    w = w / w.sum()
    rayleigh = np.real(psi.conj() @ H @ psi) / np.real(psi.conj() @ psi)

    dt = DeviceTerms.from_terms(terms)
    e_mean, e_var, _ = expectation_energy(
        dt,
        jnp.asarray(h.basis),
        jnp.asarray(log_amp, dtype=jnp.float32),
        jnp.asarray(phase, dtype=jnp.float32),
        jnp.asarray(w),
        jnp.int32(h.size),
    )
    assert abs(float(e_mean) - rayleigh) < 5e-4


def test_ground_state_has_zero_variance():
    mol, h, terms = _setup("H2O")
    H = assemble_sparse_hamiltonian_np(terms, h.basis)
    from scipy.sparse.linalg import eigsh

    w0, v0 = eigsh(H, k=1, which="SA")
    psi = v0[:, 0]
    # exact eigenvector can have zeros; nudge to avoid undefined E_loc rows
    psi = np.where(np.abs(psi) < 1e-12, 1e-12, psi)
    log_amp = np.log(np.abs(psi))
    phase = np.where(psi >= 0, 0.0, np.pi)
    weights = np.abs(psi) ** 2 / np.sum(np.abs(psi) ** 2)

    dt = DeviceTerms.from_terms(terms)
    e_mean, e_var, _ = expectation_energy(
        dt,
        jnp.asarray(h.basis),
        jnp.asarray(log_amp, dtype=jnp.float32),
        jnp.asarray(phase, dtype=jnp.float32),
        jnp.asarray(weights),
        jnp.int32(h.size),
    )
    assert abs(float(e_mean) - w0[0]) < 1e-5, (float(e_mean), w0[0])
    assert abs(float(e_mean) - mol.fci_energy) < 1e-5
    assert float(e_var) < 1e-6
