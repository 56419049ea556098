"""Density sampler, save_psi export, multi-device trainer path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import naqs_tpu as nq
from naqs_tpu.models.nade import NAQSConfig, init_params, log_psi
from naqs_tpu.sampler import sample_density
from naqs_tpu.trainer import TrainConfig, VMCTrainer, save_psi


@pytest.mark.slow
def test_density_sampler_enumerates_support():
    mol = nq.load_molecule("LiH", load_hamiltonian=False)
    h = nq.Hilbert.for_molecule(mol)
    cfg = NAQSConfig(n_qubits=mol.n_qubits, sectors=h.sectors,
                     amp_hidden=(16,), phase_hidden=(8,), masking="full")
    params = init_params(jax.random.key(0), cfg)
    b = sample_density(cfg, params, jnp.float64(1e-3), 512)
    nu = int(b.n_unique)
    assert 0 < nu < 512 and not bool(b.overflow)
    la, _ = log_psi(cfg, params, b.states[:nu])
    p_model = np.exp(2 * np.asarray(la, dtype=np.float64))
    np.testing.assert_allclose(np.asarray(b.counts[:nu]), p_model, rtol=1e-4)
    assert np.all(p_model >= 1e-3 - 1e-9)
    # completeness: every basis state above threshold is in the beam
    la_all, _ = log_psi(cfg, params, jnp.asarray(h.basis))
    p_all = np.exp(2 * np.asarray(la_all, dtype=np.float64))
    expected = set(h.basis[p_all >= 1.001e-3].tolist())
    got = set(np.asarray(b.states[:nu]).tolist())
    assert expected <= got


@pytest.mark.slow
def test_save_psi_roundtrip(tmp_path):
    mol = nq.load_molecule("H2")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(n_qubits=4, sectors=h.sectors, amp_hidden=(8,),
                     phase_hidden=(8,), masking="full")
    tr = VMCTrainer(cfg, terms, h, TrainConfig(seed=0))
    fname = str(tmp_path / "psi")
    save_psi(tr, fname)
    psi = np.loadtxt(fname + ".txt")
    basis = np.loadtxt(fname + "_basis.txt")
    assert psi.shape == (4, 2)
    assert basis.shape == (4, 4)
    np.testing.assert_allclose(np.sum(psi[:, 0] ** 2), 1.0, atol=1e-5)
    assert np.all(np.diff(psi[:, 0]) <= 1e-9)  # sorted descending


@pytest.mark.slow
def test_trainer_multi_device_path():
    mol = nq.load_molecule("H2")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(n_qubits=4, sectors=h.sectors, amp_hidden=(16,),
                     phase_hidden=(16,), masking="partial")
    tc = TrainConfig(n_train=450, n_samples=1e5, n_unq_samples_min=4,
                     n_unq_samples_max=512, use_lr_schedule=False, lr=2e-3, seed=5)
    tr = VMCTrainer(cfg, terms, h, tc, n_devices=8)
    assert tr._sharded_step is not None
    tr.run(450, output_freq=1000)
    e = tr.exact_energy()
    assert e - mol.fci_energy < 1.6e-3, (e, mol.fci_energy)


@pytest.mark.slow
def test_density_training_reaches_chem_acc():
    """The density-sampling training mode (reference
    DensitySamplingOptimizer, energy.py:1058-1205) trains H2 end-to-end."""
    import naqs_tpu as nq
    from naqs_tpu.models.nade import NAQSConfig
    from naqs_tpu.trainer import TrainConfig, VMCTrainer

    mol = nq.load_molecule("H2")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(n_qubits=mol.n_qubits, sectors=h.sectors,
                     amp_hidden=(32,), phase_hidden=(32,), masking="partial")
    tc = TrainConfig(use_lr_schedule=False, lr=2e-3,
                     n_unq_samples_min=1, n_unq_samples_max=16)
    tr = VMCTrainer(cfg, terms, h, tc)
    tr.run_density(400, output_freq=1000, d_p=1e-6)
    e = tr.exact_energy()
    assert e - mol.fci_energy < 1.6e-3, (e, mol.fci_energy)


@pytest.mark.slow
def test_cli_density_mode(tmp_path):
    from naqs_tpu.cli import run

    res = run(["-m", "H2", "-n_train", "400", "-sample_dP", "1e-6",
               "-lr", "2e-3", "-n_hid", "16", "-n_unq_samps_min", "1",
               "-n_unq_samps_max", "16", "-o", str(tmp_path), "-s", "3"])
    s = res["run_0"]
    assert s["e_exact_final"] < s["hf_energy"]


@pytest.mark.slow
def test_solve_h_uses_training_counter():
    """solve_h draws its subspace from the accumulated sampled-state counter
    (reference energy.py:137,300,762-786), capped at top-k."""
    import naqs_tpu as nq
    from naqs_tpu.models.nade import NAQSConfig
    from naqs_tpu.trainer import TrainConfig, VMCTrainer

    mol = nq.load_molecule("LiH")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(n_qubits=mol.n_qubits, sectors=h.sectors,
                     amp_hidden=(16,), phase_hidden=(16,), masking="partial")
    tc = TrainConfig(use_lr_schedule=False, n_samples=1e5,
                     n_unq_samples_min=1, n_unq_samples_max=256)
    tr = VMCTrainer(cfg, terms, h, tc)
    assert not tr.sampled_counter
    for _ in range(5):
        tr.step()
    assert len(tr.sampled_counter) > 0
    # top-k truncation picks the most-sampled subset of the counter
    e_full, nu_full = tr.solve_h()
    e_top, nu_top = tr.solve_h(k_max=8)
    assert nu_full == len(tr.sampled_counter)
    assert e_top >= e_full - 1e-12  # smaller subspace -> variational bound
    assert e_full >= mol.fci_energy - 1e-9


def test_sample_controller_overflow_hysteresis():
    """A recently-overflowed n_samples level is not re-tried every step
    (the grow->overflow->shrink thrash doubles step cost); it IS re-probed
    after OVF_RETRY_STEPS steps, since training moves the distribution."""
    mol = nq.load_molecule("H2")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(n_qubits=4, sectors=h.sectors, amp_hidden=(8,),
                     phase_hidden=(8,), masking="full")
    tr = VMCTrainer(cfg, terms, h, TrainConfig(seed=0, n_samples=1e7))
    assert not tr._grow_blocked()
    tr.n_samples = 1e8
    tr._note_overflow()           # overflow observed at 1e8
    tr.n_samples = 1e7
    assert tr._grow_blocked()     # 1e7 * 10 == 1e8: blocked
    tr.n_samples = 1e6
    assert not tr._grow_blocked()  # 1e6 * 10 < 1e8: free to grow
    tr.n_samples = 1e7
    tr.n_steps += tr.OVF_RETRY_STEPS
    assert not tr._grow_blocked()  # stale overflow: re-probe
