"""LUT conditionals, combined amp-phase blocks, exact-sampling training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import naqs_tpu as nq
from naqs_tpu.models.nade import (
    NAQSConfig, amp_conditional_shell, init_params, log_psi, split_spins,
    shell_tables,
)
from naqs_tpu.trainer import TrainConfig, VMCTrainer


def _cfg(name="LiH", **kw):
    mol = nq.load_molecule(name, load_hamiltonian=False)
    h = nq.Hilbert.for_molecule(mol)
    d = dict(n_qubits=mol.n_qubits, sectors=h.sectors,
             amp_hidden=(16,), phase_hidden=(8,), masking="full")
    d.update(kw)
    return mol, h, NAQSConfig(**d)


@pytest.mark.parametrize("kw", [
    dict(num_lut=2),
    dict(combined_amp_phase=True),
    dict(num_lut=2, combined_amp_phase=True),
    dict(num_lut=1, aggregate_phase=True),
])
@pytest.mark.slow
def test_variant_normalization_and_shell_consistency(kw):
    mol, h, cfg = _cfg(**kw)
    params = init_params(jax.random.key(0), cfg)
    la, ph = log_psi(cfg, params, jnp.asarray(h.basis))
    total = float(jnp.sum(jnp.exp(2.0 * la)))
    assert abs(total - 1.0) < 1e-4, total

    # sampler-facing single-shell eval matches the stacked predict tables
    states = jnp.asarray(h.basis[:40])
    tables, _ = shell_tables(cfg, params, states)
    alpha, beta = split_spins(cfg, states)
    for j in [0, 1, 3]:
        keep = jnp.arange(cfg.n_shells) < j
        la_j, _, _ = amp_conditional_shell(
            cfg, params, jnp.int32(j), alpha * keep, beta * keep
        )
        np.testing.assert_allclose(
            np.asarray(la_j), np.asarray(tables[:, j]), atol=1e-5
        )


@pytest.mark.slow
def test_lut_param_group_and_training():
    mol = nq.load_molecule("H2")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(n_qubits=4, sectors=h.sectors, amp_hidden=(16,),
                     phase_hidden=(16,), num_lut=1, masking="full")
    tc = TrainConfig(n_train=600, n_samples=1e5, n_unq_samples_min=4,
                     n_unq_samples_max=16, lr_lut=1e-2, seed=2)
    tr = VMCTrainer(cfg, terms, h, tc)
    lut_before = np.asarray(tr.params["lut"][0]).copy()
    tr.run(600, output_freq=1000)
    lut_after = np.asarray(tr.params["lut"][0])
    assert not np.allclose(lut_before, lut_after)  # LUT group actually trains
    assert tr.exact_energy() - mol.fci_energy < 5e-3


def test_exact_sampling_training():
    mol = nq.load_molecule("H2")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(n_qubits=4, sectors=h.sectors, amp_hidden=(16,),
                     phase_hidden=(16,), masking="full")
    tc = TrainConfig(n_train=300, use_lr_schedule=False, lr=5e-3, seed=3)
    tr = VMCTrainer(cfg, terms, h, tc)
    tr.run_exact(300, output_freq=1000)
    e = tr.exact_energy()
    assert e - mol.fci_energy < 1.6e-3, (e, mol.fci_energy)


@pytest.mark.parametrize("kw", [
    dict(input_encoding="integer"),
    dict(input_encoding="integer", use_amp_spin_sym=False),
    dict(input_encoding="integer", num_lut=2, aggregate_phase=True),
])
@pytest.mark.slow
def test_integer_encoding(kw):
    mol, h, cfg = _cfg(**kw)
    params = init_params(jax.random.key(9), cfg)
    la, _ = log_psi(cfg, params, jnp.asarray(h.basis))
    total = float(jnp.sum(jnp.exp(2.0 * la)))
    assert abs(total - 1.0) < 1e-4, total
    if cfg.use_amp_spin_sym:
        # exchange symmetry still holds with the integer encoding
        from tests.test_model import _swap_spins

        swapped = _swap_spins(h.basis, mol.n_qubits)
        la2, _ = log_psi(cfg, params, jnp.asarray(swapped))
        np.testing.assert_allclose(np.asarray(la), np.asarray(la2), atol=1e-5)
    states = jnp.asarray(h.basis[:32])
    tables, _ = shell_tables(cfg, params, states)
    alpha, beta = split_spins(cfg, states)
    for j in [0, 2, cfg.n_shells - 1]:
        keep = jnp.arange(cfg.n_shells) < j
        la_j, _, _ = amp_conditional_shell(
            cfg, params, jnp.int32(j), alpha * keep, beta * keep
        )
        np.testing.assert_allclose(
            np.asarray(la_j), np.asarray(tables[:, j]), atol=1e-5
        )
