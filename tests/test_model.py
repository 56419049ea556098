"""NAQS model property tests: normalization, symmetry, masking semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from naqs_tpu import Hilbert, load_molecule
from naqs_tpu.models.nade import (
    NAQSConfig,
    amp_conditional_shell,
    init_params,
    log_psi,
    shell_tables,
    split_spins,
)


def _cfg(mol, **kw):
    h = Hilbert.for_molecule(mol)
    defaults = dict(
        n_qubits=mol.n_qubits,
        sectors=h.sectors,
        amp_hidden=(16,),
        phase_hidden=(16,),
    )
    defaults.update(kw)
    return NAQSConfig(**defaults), h


def _swap_spins(states, n_qubits):
    """Exchange alpha<->beta bits of packed states."""
    states = np.asarray(states, dtype=np.uint64)
    alpha_mask = np.uint64(sum(1 << (2 * i) for i in range(n_qubits // 2)))
    beta_mask = np.uint64(sum(1 << (2 * i + 1) for i in range(n_qubits // 2)))
    return ((states & alpha_mask) << np.uint64(1)) | (
        (states & beta_mask) >> np.uint64(1)
    )


@pytest.mark.parametrize("masking", ["full", "partial"])
def test_normalization_over_restricted_basis(masking):
    mol = load_molecule("LiH", load_hamiltonian=False)
    cfg, h = _cfg(mol, masking=masking)
    params = init_params(jax.random.key(0), cfg)
    la, ph = log_psi(cfg, params, jnp.asarray(h.basis))
    total = float(jnp.sum(jnp.exp(2.0 * la)))
    if masking == "full":
        # hard constraints: probability mass exactly 1 on the valid basis
        assert abs(total - 1.0) < 1e-5, total
    else:
        # partial masking leaks mass through the unmasked last shell
        assert 0.05 < total <= 1.0 + 1e-5


def test_zero_amplitude_outside_basis_full_masking():
    mol = load_molecule("LiH", load_hamiltonian=False)
    cfg, h = _cfg(mol, masking="full")
    params = init_params(jax.random.key(1), cfg)
    rng = np.random.default_rng(3)
    bad = rng.integers(0, 2**mol.n_qubits, size=500, dtype=np.uint64)
    bad = bad[~h.contains(bad)]
    la, _ = log_psi(cfg, params, jnp.asarray(bad))
    assert float(jnp.max(jnp.exp(la))) < 1e-20


def test_spin_exchange_amplitude_symmetry():
    mol = load_molecule("LiH", load_hamiltonian=False)
    cfg, h = _cfg(mol, use_amp_spin_sym=True, masking="full")
    params = init_params(jax.random.key(2), cfg)
    states = h.basis
    swapped = _swap_spins(states, mol.n_qubits)
    assert np.all(h.contains(swapped))  # (2,2) sector is swap-closed
    la1, _ = log_psi(cfg, params, jnp.asarray(states))
    la2, _ = log_psi(cfg, params, jnp.asarray(swapped))
    np.testing.assert_allclose(np.asarray(la1), np.asarray(la2), atol=1e-5)


def test_spin_exchange_phase_parity_rule():
    mol = load_molecule("LiH", load_hamiltonian=False)
    cfg, h = _cfg(
        mol, use_amp_spin_sym=True, use_phase_spin_sym=True,
        aggregate_phase=True, masking="full",
    )
    params = init_params(jax.random.key(4), cfg)
    states = h.basis
    swapped = _swap_spins(states, mol.n_qubits)
    la1, p1 = log_psi(cfg, params, jnp.asarray(states))
    la2, p2 = log_psi(cfg, params, jnp.asarray(swapped))
    np.testing.assert_allclose(np.asarray(la1), np.asarray(la2), atol=1e-5)
    # psi(swap(s)) = +-psi(s): phases differ by a multiple of pi
    dp = (np.asarray(p1) - np.asarray(p2)) / np.pi
    np.testing.assert_allclose(dp, np.round(dp), atol=1e-4)


def test_no_spin_sym_breaks_symmetry():
    mol = load_molecule("LiH", load_hamiltonian=False)
    cfg, h = _cfg(mol, use_amp_spin_sym=False, masking="full")
    params = init_params(jax.random.key(5), cfg)
    states = h.basis
    swapped = _swap_spins(states, mol.n_qubits)
    la1, _ = log_psi(cfg, params, jnp.asarray(states))
    la2, _ = log_psi(cfg, params, jnp.asarray(swapped))
    assert not np.allclose(np.asarray(la1), np.asarray(la2), atol=1e-5)


@pytest.mark.slow
def test_shell_conditional_matches_predict_tables():
    """Sampler-facing single-shell eval must agree with the stacked predict."""
    mol = load_molecule("H2O", load_hamiltonian=False)
    cfg, h = _cfg(mol, masking="full")
    params = init_params(jax.random.key(6), cfg)
    states = jnp.asarray(h.basis[:50])
    tables, _ = shell_tables(cfg, params, states)
    alpha, beta = split_spins(cfg, states)
    for j in [0, 2, cfg.n_shells - 1]:
        keep = jnp.arange(cfg.n_shells) < j
        la_j, mask_j, probs_j = amp_conditional_shell(
            cfg, params, jnp.int32(j), alpha * keep, beta * keep
        )
        np.testing.assert_allclose(
            np.asarray(la_j), np.asarray(tables[:, j]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(jnp.sum(probs_j, -1)), 1.0, atol=1e-5
        )


@pytest.mark.slow
def test_multi_sector_masking_open_shell():
    mol = load_molecule("O2", load_hamiltonian=False)
    h = Hilbert.for_molecule(mol, restrict_to_ms=False)
    cfg = NAQSConfig(
        n_qubits=mol.n_qubits, sectors=h.sectors, masking="full",
        amp_hidden=(8,), phase_hidden=(8,), use_amp_spin_sym=True,
    )
    params = init_params(jax.random.key(7), cfg)
    la, _ = log_psi(cfg, params, jnp.asarray(h.basis))
    total = float(jnp.sum(jnp.exp(2.0 * la)))
    assert abs(total - 1.0) < 1e-4, total
