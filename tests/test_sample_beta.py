"""Tempered ancestral sampling (-sample_beta), a beyond-reference extension.

beta < 1 draws from per-shell conditionals p^beta (renormalized), widening
sampled support into the |psi|^2 tail; combined with reweight_by_psi the
expectation weights stay the exact |psi|^2, so estimators remain unbiased
on the sampled support. Targets the from-scratch stall mechanism measured
in docs/ENGINE_NOTES.md ("anatomy of the from-scratch stall").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import naqs_tpu as nq
from naqs_tpu.models.nade import NAQSConfig, init_params
from naqs_tpu.ops.local_energy import DeviceTerms
from naqs_tpu.sampler import sample
from naqs_tpu.trainer import TrainConfig, VMCTrainer, vmc_update


def _setup(molecule="LiH"):
    mol = nq.load_molecule(molecule)
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(n_qubits=mol.n_qubits, sectors=h.sectors,
                     amp_hidden=(16,), phase_hidden=(16,), masking="full")
    params = init_params(jax.random.PRNGKey(0), cfg)
    return mol, h, terms, cfg, params


def _skewed_params(mol, h, terms, cfg, params, n_steps=30):
    """A few count-weighted updates to give |psi|^2 a realistic skew."""
    tc = TrainConfig(n_train=100, seed=5)
    opt = tc.make_optimizer()
    opt_state = opt.init(params)
    dt = DeviceTerms.from_terms(terms, hilbert=h)
    from naqs_tpu.sampler import SampleBatch

    basis = np.sort(h.basis)
    batch = SampleBatch(states=jnp.asarray(basis),
                        counts=jnp.ones((len(basis),), jnp.float64),
                        n_unique=jnp.int32(len(basis)),
                        overflow=jnp.array(False))
    for _ in range(n_steps):
        params, opt_state, _ = vmc_update(cfg, opt, params, opt_state, dt,
                                          batch, True)
    return params, dt


def test_beta_one_is_default_path():
    mol, h, terms, cfg, params = _setup("H2")
    k = jax.random.PRNGKey(7)
    a = sample(cfg, params, k, jnp.float64(1e4), 64)
    b = sample(cfg, params, k, jnp.float64(1e4), 64, beta=1.0)
    np.testing.assert_array_equal(np.asarray(a.states), np.asarray(b.states))
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))


def test_tempering_widens_support_and_conserves_counts():
    mol, h, terms, cfg, params = _setup("LiH")
    params, _ = _skewed_params(mol, h, terms, cfg, params)
    cap = 1024
    # small sample count: the plain sampler cannot reach the |psi|^2 tail
    # (LiH sector = 225 states; at p^0.25 the draw is near-uniform)
    n = jnp.float64(1000.0)
    k = jax.random.PRNGKey(11)
    plain = sample(cfg, params, k, n, cap)
    temp = sample(cfg, params, k, n, cap, beta=0.25)
    nu_p, nu_t = int(plain.n_unique), int(temp.n_unique)
    assert nu_t > nu_p, (nu_p, nu_t)
    # full-mask sampling loses no mass: multiplicities still sum to n
    np.testing.assert_allclose(float(jnp.sum(temp.counts)), 1000.0,
                               rtol=1e-12)
    # every sampled state is a valid sector state
    live = np.asarray(temp.states)[: nu_t]
    basis = set(np.sort(h.basis).tolist())
    assert all(int(s) in basis for s in live.tolist())


def test_tempered_energy_estimate_matches_exact_on_full_support():
    """With support = the whole sector and reweight_by_psi, the sampled
    energy equals the exact Rayleigh quotient REGARDLESS of the sampling
    distribution — the invariance that makes tempering safe."""
    mol, h, terms, cfg, params = _setup("H2")
    params, dt = _skewed_params(mol, h, terms, cfg, params, n_steps=10)
    tc = TrainConfig(n_train=10, seed=5)
    opt = tc.make_optimizer()
    opt_state = opt.init(params)

    cap = 64
    k = jax.random.PRNGKey(3)
    batch = sample(cfg, params, k, jnp.float64(1e7), cap, beta=0.4)
    assert int(batch.n_unique) == len(h.basis)  # full sector covered

    _, _, m_temp = vmc_update(cfg, opt, params, opt_state, dt, batch, True)

    from naqs_tpu.sampler import SampleBatch

    basis = np.sort(h.basis)
    full = SampleBatch(states=jnp.asarray(basis),
                       counts=jnp.ones((len(basis),), jnp.float64),
                       n_unique=jnp.int32(len(basis)),
                       overflow=jnp.array(False))
    _, _, m_exact = vmc_update(cfg, opt, params, opt_state, dt, full, True)
    np.testing.assert_allclose(float(m_temp["e_loc"]),
                               float(m_exact["e_loc"]), rtol=0, atol=1e-9)


def test_trainer_accepts_sample_beta():
    mol, h, terms, cfg, params = _setup("H2")
    tc = TrainConfig(n_train=5, n_samples=1e5, n_unq_samples_min=2,
                     n_unq_samples_max=64, sample_beta=0.8,
                     reweight_by_psi=True, seed=1)
    tr = VMCTrainer(cfg, terms, h, tc)
    for _ in range(3):
        tr.step()
    e = tr.log["E_LOC"][-1][1]
    assert np.isfinite(e)


def test_sharded_step_with_tempering():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from naqs_tpu.parallel.step import make_mesh, make_sharded_train_step

    mol, h, terms, cfg, params = _setup("H2")
    tc = TrainConfig(n_train=5, seed=2)
    opt = tc.make_optimizer()
    opt_state = opt.init(params)
    dt = DeviceTerms.from_terms(terms, hilbert=h)
    mesh = make_mesh()
    step = make_sharded_train_step(cfg, opt, mesh, 64,
                                   reweight_by_psi=True, sample_beta=0.6)
    keys = jax.random.split(jax.random.PRNGKey(0), mesh.devices.size)
    params2, opt_state2, metrics = step(params, opt_state, dt, keys,
                                        jnp.float64(1e5))
    assert np.isfinite(float(metrics["e_loc"]))
