"""Multi-chip sharded training on an 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import naqs_tpu as nq
from naqs_tpu.models.nade import NAQSConfig, init_params
from naqs_tpu.ops.local_energy import DeviceTerms
from naqs_tpu.parallel import make_mesh, make_sharded_train_step
from naqs_tpu.trainer import TrainConfig, VMCTrainer, exact_energy


def test_virtual_mesh_available():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_sharded_step_trains_h2():
    mol = nq.load_molecule("H2")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(
        n_qubits=mol.n_qubits, sectors=h.sectors,
        amp_hidden=(32,), phase_hidden=(32,), masking="partial",
    )
    tc = TrainConfig(n_train=300, use_lr_schedule=False, lr=1e-3)
    opt = tc.make_optimizer()
    mesh = make_mesh()
    step = make_sharded_train_step(cfg, opt, mesh, capacity_per_device=8)

    params = init_params(jax.random.key(0), cfg)
    opt_state = opt.init(params)
    dt = DeviceTerms.from_terms(terms)
    key = jax.random.key(1)

    e_hist = []
    for i in range(300):
        key, k = jax.random.split(key)
        keys = jax.random.split(k, 8)
        params, opt_state, metrics = step(
            params, opt_state, dt, keys, jnp.float64(1e5)
        )
        e_hist.append(float(metrics["e_loc"]))
        assert not bool(metrics["overflow"])

    e = float(exact_energy(cfg, params, dt, jnp.asarray(h.basis)))
    assert e - mol.fci_energy < 1.6e-3, (e, mol.fci_energy)
    # energy decreased substantially from the start
    assert np.mean(e_hist[-20:]) < np.mean(e_hist[:20]) - 0.1


@pytest.mark.slow
def test_sharded_metrics_match_single_chip_statistics():
    """Global count-weighted <E_loc> from the mesh must be consistent with a
    single-chip estimate (same params, same physics) within noise."""
    mol = nq.load_molecule("LiH")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(
        n_qubits=mol.n_qubits, sectors=h.sectors,
        amp_hidden=(16,), phase_hidden=(16,), masking="full",
    )
    params = init_params(jax.random.key(3), cfg)
    dt = DeviceTerms.from_terms(terms)
    opt = TrainConfig(lr=0.0, use_lr_schedule=False).make_optimizer()  # no-op update
    mesh = make_mesh()
    step = make_sharded_train_step(cfg, opt, mesh, capacity_per_device=256)
    opt_state = opt.init(params)
    _, _, m = step(
        params, opt_state, dt, jax.random.split(jax.random.key(4), 8),
        jnp.float64(8e5),
    )
    e_mesh = float(m["e_loc"])
    # exact value over the basis as the ground truth for the estimator
    e_exact = float(exact_energy(cfg, params, dt, jnp.asarray(h.basis)))
    assert abs(e_mesh - e_exact) < 0.05, (e_mesh, e_exact)


@pytest.mark.slow
def test_sharded_sr_trains_h2_to_chemical_accuracy():
    """-sr -devices 8 runs a true psum'd SR step (round-1 defect: it
    silently trained plain Adam)."""
    mol = nq.load_molecule("H2")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(
        n_qubits=mol.n_qubits, sectors=h.sectors,
        amp_hidden=(16,), phase_hidden=(16,), masking="full",
    )
    tc = TrainConfig(use_sr=True, use_lr_schedule=False, lr=1e-1,
                     sr_damping=1e-2, sr_cg_iters=30, n_samples=1e5,
                     n_unq_samples_min=4, n_unq_samples_max=16, seed=4)
    tr = VMCTrainer(cfg, terms, h, tc, n_devices=8)
    assert tr._sharded_sr_step is not None
    tr.pre_flatten(30)
    for _ in range(200):
        out = tr.step()
    e = tr.exact_energy()
    assert e - mol.fci_energy < 1.6e-3, (e, mol.fci_energy)


@pytest.mark.slow
def test_sharded_overflow_withholds_update():
    """On capacity overflow the device step must NOT apply the (biased)
    gradient update; the controller resamples first (round-1 defect)."""
    mol = nq.load_molecule("LiH")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(
        n_qubits=mol.n_qubits, sectors=h.sectors,
        amp_hidden=(8,), phase_hidden=(8,), masking="partial",
    )
    opt = TrainConfig(lr=1e-2, use_lr_schedule=False).make_optimizer()
    mesh = make_mesh()
    # capacity 4 per device on a 12-qubit molecule with 1e6 samples: certain overflow
    step = make_sharded_train_step(cfg, opt, mesh, capacity_per_device=4)
    params = init_params(jax.random.key(0), cfg)
    opt_state = opt.init(params)
    dt = DeviceTerms.from_terms(terms, hilbert=h)
    new_params, _, m = step(
        params, opt_state, dt, jax.random.split(jax.random.key(1), 8),
        jnp.float64(1e6),
    )
    assert bool(m["overflow"])
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(new_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_sharded_n_unique_is_globally_deduplicated():
    """Identical PRNG keys on every shard produce identical per-shard sample
    sets; the reported n_unique must count each state once, not 8x."""
    mol = nq.load_molecule("LiH")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(
        n_qubits=mol.n_qubits, sectors=h.sectors,
        amp_hidden=(8,), phase_hidden=(8,), masking="full",
    )
    opt = TrainConfig(lr=0.0, use_lr_schedule=False).make_optimizer()
    mesh = make_mesh()
    cap = 256
    step = make_sharded_train_step(cfg, opt, mesh, capacity_per_device=cap)
    params = init_params(jax.random.key(0), cfg)
    opt_state = opt.init(params)
    dt = DeviceTerms.from_terms(terms, hilbert=h)
    same = jnp.broadcast_to(jax.random.key(7), (8,))
    _, _, m = step(params, opt_state, dt, same, jnp.float64(2e4))
    assert not bool(m["overflow"])
    assert 0 < int(m["n_unique"]) <= cap, int(m["n_unique"])


@pytest.mark.slow
def test_trainer_sharded_step_controller_resamples_on_overflow():
    """VMCTrainer._step_sharded backs off n_samples on overflow and still
    completes a (non-overflowed) training step."""
    mol = nq.load_molecule("H2")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(
        n_qubits=mol.n_qubits, sectors=h.sectors,
        amp_hidden=(8,), phase_hidden=(8,), masking="partial",
    )
    tc = TrainConfig(
        n_samples=1e6, n_unq_samples_min=1, n_unq_samples_max=16,
        use_lr_schedule=False, lr=1e-3,
    )
    tr = VMCTrainer(cfg, terms, h, tc, n_devices=8)
    out = tr.step()
    assert np.isfinite(out["e_loc"])
    assert tr.n_steps == 1
