"""Stochastic-reconfiguration (natural gradient) training."""

import numpy as np
import pytest

import naqs_tpu as nq
from naqs_tpu.models.nade import NAQSConfig
from naqs_tpu.trainer import TrainConfig, VMCTrainer


@pytest.mark.slow
def test_sr_trains_h2_to_chemical_accuracy():
    mol = nq.load_molecule("H2")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(n_qubits=4, sectors=h.sectors, amp_hidden=(16,),
                     phase_hidden=(16,), masking="full")
    tc = TrainConfig(n_train=200, n_samples=1e5, n_unq_samples_min=4,
                     n_unq_samples_max=16, use_sr=True, sr_damping=1e-2,
                     sr_cg_iters=30, lr=1e-1, use_lr_schedule=False, seed=4)
    tr = VMCTrainer(cfg, terms, h, tc)
    tr.pre_flatten(30)
    tr.run(200, output_freq=1000)
    e = tr.exact_energy()
    assert e - mol.fci_energy < 1.6e-3, (e, mol.fci_energy)


@pytest.mark.slow
def test_sr_beats_adam_per_step():
    """Natural gradient must make materially more progress per step than Adam
    at the reference LR on the same budget."""
    mol = nq.load_molecule("LiH")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(n_qubits=mol.n_qubits, sectors=h.sectors,
                     amp_hidden=(16,), phase_hidden=(16,))

    def run(use_sr):
        tc = TrainConfig(
            n_train=80, n_samples=1e5, n_unq_samples_min=32,
            n_unq_samples_max=256, use_sr=use_sr, sr_cg_iters=30,
            lr=5e-2 if use_sr else 1e-3, use_lr_schedule=False, seed=0,
        )
        tr = VMCTrainer(cfg, terms, h, tc)
        tr.pre_flatten(30)
        tr.run(80, output_freq=1000)
        return tr.exact_energy()

    e_sr = run(True)
    e_adam = run(False)
    assert e_sr < e_adam - 0.02, (e_sr, e_adam)


@pytest.mark.slow
def test_warm_start_from_solve_h_escapes_and_converges():
    """Sample -> subspace FCI -> supervised warm start -> VMC reaches the
    subspace ground state region quickly."""
    mol = nq.load_molecule("LiH")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(n_qubits=mol.n_qubits, sectors=h.sectors,
                     amp_hidden=(16,), phase_hidden=(32,))
    tc = TrainConfig(n_train=200, n_samples=1e6, n_unq_samples_min=64,
                     n_unq_samples_max=256, use_lr_schedule=False, lr=1e-3, seed=6)
    tr = VMCTrainer(cfg, terms, h, tc)
    tr.pre_flatten(30)
    e_flat = tr.exact_energy()
    e_sub, n_used = tr.warm_start_from_solve_h(n_epochs=800)
    # subspace ground state over the (broad) flat-sample support ~ FCI
    assert e_sub < mol.hf_energy
    e_after_warm = tr.exact_energy()
    assert e_after_warm < e_flat - 2.0  # warm start moved far from flat init
    tr.run(200, output_freq=1000)
    e = tr.exact_energy()
    assert e - mol.fci_energy < 2e-3, (e, e_sub, mol.fci_energy)


@pytest.mark.slow
def test_overlap_retarget_does_not_regress_good_models():
    """Round-3 finding: the democratic log-amp MSE retarget measurably
    REGRESSES an already-good full-mask model (H2O 6-31G: post-fit exact
    energy fell -76.114 -> -75.96 while the fit loss decreased, because
    the 149k-state unweighted MSE trades amplitude-weighted accuracy for
    tail fit). The 'overlap' loss maximizes log-fidelity to the target
    eigenvector and must (a) never regress a trained model and (b) land
    the model near the target energy."""
    mol = nq.load_molecule("LiH")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(n_qubits=mol.n_qubits, sectors=h.sectors,
                     amp_hidden=(16,), phase_hidden=(32,), masking="full")
    tc = TrainConfig(n_train=200, n_samples=1e6, n_unq_samples_min=64,
                     n_unq_samples_max=256, use_lr_schedule=False,
                     lr=1e-3, seed=6)
    tr = VMCTrainer(cfg, terms, h, tc)
    tr.pre_flatten(30)
    tr.run(150, output_freq=1000)
    e_before = tr.exact_energy()
    e0, _ = tr.warm_start_from_solve_h(states=h.basis, n_epochs=500,
                                       loss="overlap")
    e_after = tr.exact_energy()
    assert e_after < e_before + 1e-4, (e_before, e_after)
    assert e_after - e0 < 5e-3, (e_after, e0)


@pytest.mark.slow
def test_wmse_retarget_tracks_target():
    """|target|^2-weighted MSE variant of the same protocol."""
    mol = nq.load_molecule("LiH")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(n_qubits=mol.n_qubits, sectors=h.sectors,
                     amp_hidden=(16,), phase_hidden=(32,))
    tc = TrainConfig(n_train=200, n_samples=1e6, n_unq_samples_min=64,
                     n_unq_samples_max=256, use_lr_schedule=False,
                     lr=1e-3, seed=6)
    tr = VMCTrainer(cfg, terms, h, tc)
    tr.pre_flatten(30)
    e0, _ = tr.warm_start_from_solve_h(states=h.basis, n_epochs=600,
                                       loss="wmse")
    e_after = tr.exact_energy()
    assert e_after - e0 < 1e-2, (e_after, e0)
