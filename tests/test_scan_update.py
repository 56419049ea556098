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


def test_flush_sentinel_halves_window_on_crash_resume(tmp_path, monkeypatch):
    """A run that died mid-flush (axon worker fault / tunnel stall) leaves
    flush_inflight.json in save_loc; the resume must halve the scan window
    (trainer.run_exact adaptive fallback for the empirical ~3e6 cap)."""
    import json as _json

    import naqs_tpu.trainer as trmod
    from naqs_tpu.trainer import TrainConfig, VMCTrainer

    mol = nq.load_molecule("H2")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    cfg = NAQSConfig(n_qubits=mol.n_qubits, sectors=h.sectors,
                     amp_hidden=(8,), phase_hidden=(8,))
    tr = VMCTrainer(cfg, terms, h, TrainConfig(seed=0),
                    save_loc=str(tmp_path))

    seen = []
    real = trmod.vmc_update_scan

    def spy(*args, **kw):
        seen.append(kw.get("length"))
        # the sentinel must exist DURING the dispatch
        assert (tmp_path / "flush_inflight.json").exists()
        return real(*args, **kw)

    monkeypatch.setattr(trmod, "vmc_update_scan", spy)

    # fresh run on a 4-state basis: window = min(25, 3e6//4) = 25
    tr.run_exact(2)
    assert seen == [25]
    assert not (tmp_path / "flush_inflight.json").exists()

    # simulate a crash mid-flush at window 25 -> resume halves to 12
    with open(tmp_path / "flush_inflight.json", "w") as f:
        _json.dump({"flush": 25, "step": 2}, f)
    seen.clear()
    tr.run_exact(2)
    assert seen == [12]
    assert not (tmp_path / "flush_inflight.json").exists()
