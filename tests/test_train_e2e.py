"""End-to-end VMC training gates (reference test strategy, SURVEY.md section 4).

H2 must reach chemical accuracy (E - E_FCI < 1.6e-3 Ha) in a short fixed
budget; the VMC+FCI refinement must match as well.
"""

import numpy as np
import pytest

import naqs_tpu as nq
from naqs_tpu.models.nade import NAQSConfig
from naqs_tpu.trainer import TrainConfig, VMCTrainer

CHEM_ACC = 1.6e-3


@pytest.fixture(scope="module")
def h2_trained():
    mol = nq.load_molecule("H2")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(
        n_qubits=mol.n_qubits, sectors=h.sectors,
        amp_hidden=(32,), phase_hidden=(32,), masking="partial",
    )
    tc = TrainConfig(
        n_train=400, n_samples=1e5, n_samples_max=1e7,
        n_unq_samples_min=4, n_unq_samples_max=16, seed=1,
    )
    tr = VMCTrainer(cfg, terms, h, tc)
    tr.pre_flatten(50)
    tr.run(400, output_freq=1000)
    return mol, tr


@pytest.mark.slow
def test_h2_chemical_accuracy(h2_trained):
    mol, tr = h2_trained
    e = tr.exact_energy()
    assert e - mol.fci_energy < CHEM_ACC, (e, mol.fci_energy)
    assert e > mol.fci_energy - 1e-6  # variational bound


@pytest.mark.slow
def test_h2_solve_h_refinement(h2_trained):
    mol, tr = h2_trained
    e, n_unq = tr.solve_h(n_samps=1e5)
    assert abs(e - mol.fci_energy) < 1e-6  # full support sampled -> exact FCI
    assert n_unq <= 4


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, h2_trained):
    mol, tr = h2_trained
    tr.save_loc = str(tmp_path)
    tr.save()
    e_before = tr.exact_energy()
    import jax

    tr.params = jax.tree_util.tree_map(lambda x: x * 0.0, tr.params)
    tr.load()
    assert abs(tr.exact_energy() - e_before) < 1e-9


@pytest.mark.slow
def test_checkpoint_resume_is_bit_faithful(tmp_path, h2_trained):
    """A resumed run must reproduce the interrupted run's sample stream:
    the PRNG key (and controller state) are part of the checkpoint."""
    import jax
    import numpy as np
    from naqs_tpu.trainer import VMCTrainer

    mol, tr = h2_trained
    tr.save_loc = str(tmp_path)
    tr.save()
    tr2 = VMCTrainer(tr.cfg, tr.terms, tr.hilbert, tr.tc, save_loc=str(tmp_path))
    tr2.load()
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(tr.key)),
        np.asarray(jax.random.key_data(tr2.key)),
    )
    o1, o2 = tr.step(), tr2.step()
    assert o1["n_unique"] == o2["n_unique"]
    assert abs(o1["e_loc"] - o2["e_loc"]) < 1e-9


@pytest.mark.slow
def test_counter_persists_across_checkpoint(tmp_path, h2_trained):
    """solve_h draws from the cross-step sampled-state counter; the counter
    must survive save/load (reference checkpoints its Counter,
    energy.py:409-487) or every fleet resume forgets the history."""
    mol, tr = h2_trained
    assert tr.sampled_counter, "training should have populated the counter"
    tr.save_loc = str(tmp_path)
    tr.save()
    tr2 = VMCTrainer(tr.cfg, tr.terms, tr.hilbert, tr.tc, save_loc=str(tmp_path))
    assert not tr2.sampled_counter
    tr2.load()
    assert tr2.sampled_counter == tr.sampled_counter
    e1, n1 = tr.solve_h(use_counter=True)
    e2, n2 = tr2.solve_h(use_counter=True)
    assert n1 == n2
    assert abs(e1 - e2) < 1e-12


@pytest.mark.slow
def test_warm_start_protocol_stays_finite():
    """Round-2 regression: on stretched N2 the solve_H warm start collapsed
    the sampled distribution onto a near-delta (fitting log(1e-30) targets
    for numerically-zero eigenvector entries), then n_unique -> 0 and the
    0/0 count weights poisoned params with NaN permanently. The protocol
    must keep the sampler healthy and training finite."""
    import math

    mol = nq.load_molecule("N2_2.25")
    h = nq.Hilbert.for_molecule(mol, restrict_to_ms=True)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    s = mol.n_qubits // 2
    cfg = NAQSConfig(
        n_qubits=mol.n_qubits, sectors=h.sectors, masking="partial",
        amp_hidden=(16,), phase_hidden=(64,), use_amp_spin_sym=True,
        shell_order=tuple(range(s - 1, -1, -1)),
    )
    tc = TrainConfig(n_train=400, n_samples=1e6, n_unq_samples_min=64,
                     n_unq_samples_max=1024, seed=3)
    tr = VMCTrainer(cfg, terms, h, tc)
    tr.pre_flatten(10)
    tr.run(250, output_freq=1000)
    e_sub, n_sub = tr.warm_start_from_solve_h(n_epochs=200)
    assert math.isfinite(e_sub) and n_sub > 10
    for _ in range(40):
        out = tr.step()
        assert math.isfinite(out["e_loc"]), out
    # the sampler must not have collapsed onto a delta distribution
    assert out["n_unique"] > 10, out


def test_pretrain_hf_moves_deep_models():
    """Regression: the BCE pretrain loss must keep a gradient when the
    target amplitude is tiny. A fresh deep NADE starts every state at
    exp(la) ~ e^-(n_shells); the old clipped-BCE gradient was exactly zero
    there (observed: 500 epochs on 28-shell cc-pVTZ changed nothing)."""
    import jax.numpy as jnp

    from naqs_tpu.models.nade import log_psi

    mol = nq.load_molecule("LiH")  # 6 shells: exp(la_init) ~ 1e-4 < clip
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(
        n_qubits=mol.n_qubits, sectors=h.sectors,
        amp_hidden=(16,), phase_hidden=(16,),
    )
    tr = VMCTrainer(cfg, terms, h, TrainConfig(seed=3))
    hf = jnp.asarray(np.array([h.hf_state()], dtype=np.uint64))
    la0, _ = log_psi(cfg, tr.params, hf)
    tr.pre_train_hf(150)
    la1, _ = log_psi(cfg, tr.params, hf)
    assert float(la1[0]) > float(la0[0]) + 1.0
    assert float(la1[0]) > -0.5  # p(HF) ~ 1 after pretraining


def test_solve_h_states_override():
    """solve_h(states=...) diagonalizes exactly the given basis (the
    exact-sampling CLI path passes the full training basis because exact
    mode never feeds the sampled counter)."""
    import numpy as np
    from scipy.sparse.linalg import eigsh

    import naqs_tpu as nq
    from naqs_tpu.hamiltonian import assemble_sparse_hamiltonian_np
    from naqs_tpu.models.nade import NAQSConfig
    from naqs_tpu.trainer import TrainConfig, VMCTrainer

    mol = nq.load_molecule("H2")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(n_qubits=mol.n_qubits, sectors=h.sectors)
    tr = VMCTrainer(cfg, terms, h, TrainConfig(n_train=1, seed=5))
    e0, nu = tr.solve_h(states=h.basis)
    assert nu == len(h.basis)
    H = assemble_sparse_hamiltonian_np(terms, np.sort(np.asarray(h.basis)))
    w = np.linalg.eigvalsh(H.toarray())[0]
    assert abs(e0 - w) < 1e-10
    assert abs(e0 - mol.fci_energy) < 1e-8


def test_s2_penalty_training_reports_pure_h():
    """Spin-penalty training (train_terms = H + lam*S^2): the training
    objective includes the penalty, but exact_energy() reports pure <H>
    (dt_h), and exact-mode training still descends toward the singlet
    ground state (whose penalty is zero)."""
    import numpy as np

    import naqs_tpu as nq
    from naqs_tpu.models.nade import NAQSConfig
    from naqs_tpu.trainer import TrainConfig, VMCTrainer, exact_energy
    from naqs_tpu.utils.spin import penalized_termdict

    mol = nq.load_molecule("H2")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    lam = 0.5
    train_terms = nq.compile_pauli_terms(
        penalized_termdict(mol.qubit_hamiltonian, mol.n_qubits, lam),
        mol.n_qubits)
    tr = VMCTrainer(cfg := NAQSConfig(n_qubits=mol.n_qubits,
                                      sectors=h.sectors),
                    terms, h, TrainConfig(n_train=200, seed=3,
                                          use_lr_schedule=False, lr=5e-3),
                    train_terms=train_terms)
    tr.pre_flatten(20)
    tr.run_exact(200)
    e_h = tr.exact_energy()                       # pure <H> (dt_h)
    import jax.numpy as jnp
    e_pen = float(exact_energy(cfg, tr.params, tr.dt,
                               jnp.asarray(h.basis)))  # training operator
    # <H + lam S^2> >= <H> always (S^2 is PSD); near the singlet they agree
    assert e_pen >= e_h - 1e-9
    assert e_pen - e_h < 5e-3  # residual contamination is tiny
    assert abs(e_h - mol.fci_energy) < 1.6e-3
