"""vmc_update_scan: the single-dispatch exact-mode flush must match the
sequential vmc_update step-for-step (same params, opt state, metrics), and
the n_live mask must make trailing steps exact no-ops so one compiled
program serves every partial window (reference ExactSamplingOptimizer loop,
energy.py:540-729, re-run here as a lax.scan)."""

import jax
import jax.numpy as jnp
import numpy as np

import naqs_tpu as nq
from naqs_tpu.models.nade import NAQSConfig, init_params
from naqs_tpu.ops.local_energy import DeviceTerms
from naqs_tpu.sampler import SampleBatch
from naqs_tpu.trainer import (TrainConfig, vmc_update, vmc_update_scan)


def _setup():
    mol = nq.load_molecule("H2")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(n_qubits=mol.n_qubits, sectors=h.sectors,
                     amp_hidden=(16,), phase_hidden=(16,))
    tc = TrainConfig(n_train=100, seed=3)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = tc.make_optimizer()
    opt_state = opt.init(params)
    dt = DeviceTerms.from_terms(terms, hilbert=h)
    basis = np.sort(h.basis)
    batch = SampleBatch(
        states=jnp.asarray(basis),
        counts=jnp.ones((len(basis),), jnp.float64),
        n_unique=jnp.int32(len(basis)),
        overflow=jnp.array(False),
    )
    return cfg, opt, params, opt_state, dt, batch


def test_scan_matches_sequential_updates():
    cfg, opt, params, opt_state, dt, batch = _setup()

    p_seq, o_seq = params, opt_state
    es = []
    for _ in range(5):
        p_seq, o_seq, m = vmc_update(cfg, opt, p_seq, o_seq, dt, batch, True)
        es.append(float(m["e_loc"]))

    p_scan, o_scan, ms = vmc_update_scan(
        cfg, opt, params, opt_state, dt, batch, jnp.int32(5), length=5)

    np.testing.assert_allclose(np.asarray(ms)[:, 0], es, rtol=0, atol=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(p_seq),
                    jax.tree_util.tree_leaves(p_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(o_seq),
                    jax.tree_util.tree_leaves(o_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-12)


def test_scan_n_live_masks_trailing_steps():
    cfg, opt, params, opt_state, dt, batch = _setup()

    p3, o3, _ = vmc_update_scan(
        cfg, opt, params, opt_state, dt, batch, jnp.int32(3), length=8)
    p_seq, o_seq = params, opt_state
    for _ in range(3):
        p_seq, o_seq, _ = vmc_update(cfg, opt, p_seq, o_seq, dt, batch, True)

    for a, b in zip(jax.tree_util.tree_leaves(p_seq),
                    jax.tree_util.tree_leaves(p3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-12)
    # the optimizer step counter must also freeze (LR schedules key off it)
    for a, b in zip(jax.tree_util.tree_leaves(o_seq),
                    jax.tree_util.tree_leaves(o3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-12)
