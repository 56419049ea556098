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


def _mk_shard_buffers(h, n_per=16, n_dev=8, seed=0):
    """Disjoint per-shard sorted SENTINEL-padded buffers with ragged valid
    counts, plus the merged global table (what all_gather+sort produces)."""
    from naqs_tpu.utils.bits import SENTINEL

    rng = np.random.default_rng(seed)
    basis = np.asarray(h.basis, np.uint64)
    nus = np.array([n_per - (d % 3) for d in range(n_dev)])
    sel = rng.choice(len(basis), size=int(nus.sum()), replace=False)
    la_g = (rng.normal(size=nus.sum()).astype(np.float32) - 1.0)
    ph_g = rng.normal(size=nus.sum()).astype(np.float32)
    qs = np.full((n_dev, n_per), SENTINEL, np.uint64)
    qla = np.zeros((n_dev, n_per), np.float32)
    qph = np.zeros((n_dev, n_per), np.float32)
    off = 0
    for d in range(n_dev):
        nu = nus[d]
        order = np.argsort(basis[sel[off:off + nu]])
        qs[d, :nu] = basis[sel[off:off + nu]][order]
        qla[d, :nu] = la_g[off:off + nu][order]
        qph[d, :nu] = ph_g[off:off + nu][order]
        off += nu
    flat = qs.reshape(-1)
    o = np.argsort(flat, kind="stable")
    return (qs, qla, qph, nus,
            flat[o], qla.reshape(-1)[o], qph.reshape(-1)[o], int(nus.sum()))


def _run_sharded_eloc(dt, qs, qla, qph, n_dev=8):
    from jax.sharding import PartitionSpec as P

    from naqs_tpu.ops.local_energy import local_energy

    mesh = make_mesh()

    def f(qs, qla, qph):
        qs, qla, qph = qs[0], qla[0], qph[0]
        gs = jax.lax.all_gather(qs, "dp").reshape(-1)
        gla = jax.lax.all_gather(qla, "dp").reshape(-1)
        gph = jax.lax.all_gather(qph, "dp").reshape(-1)
        order = jnp.argsort(gs)
        gs, gla, gph = gs[order], gla[order], gph[order]
        from naqs_tpu.utils.bits import SENTINEL
        gnv = jnp.sum(gs != jnp.uint64(SENTINEL)).astype(jnp.int32)
        e_re, e_im = local_energy(dt, gs, gla, gph, gnv,
                                  queries=(qs, qla, qph),
                                  axis_name="dp", axis_size=n_dev)
        return e_re[None], e_im[None]

    sharded = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P("dp"), P("dp"), P("dp")),
        out_specs=P("dp"), check_vma=False))
    return sharded(jnp.asarray(qs), jnp.asarray(qla), jnp.asarray(qph))


def test_sharded_eloc_matches_single_chip_all_engines():
    """VERDICT r3 #1: the mesh step computes E_loc for each shard's OWN rows
    against the global table. Per-row energies must match the single-chip
    engine over the merged buffer, for every engine path (dense grid,
    factored grid, rank membership, sort membership)."""
    import dataclasses

    from naqs_tpu.ops.dense_engine import DenseTerms, FactorTerms
    from naqs_tpu.ops.local_energy import local_energy

    mol = nq.load_molecule("LiH")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    qs, qla, qph, nus, gs, gla, gph, gnv = _mk_shard_buffers(h, n_per=16)

    dt_dense = DeviceTerms.from_terms(terms, hilbert=h)
    assert isinstance(dt_dense.dense, DenseTerms)
    dt_fact = dataclasses.replace(dt_dense, dense=FactorTerms.build(terms, h))
    dt_rank = dataclasses.replace(dt_dense, dense=None)
    dt_sort = DeviceTerms.from_terms(terms)
    assert dt_sort.rank_spec is None and dt_sort.dense is None

    for label, dt in [("dense", dt_dense), ("fact", dt_fact),
                      ("rank", dt_rank), ("sort", dt_sort)]:
        e_re_1, e_im_1 = local_energy(
            dt, jnp.asarray(gs), jnp.asarray(gla), jnp.asarray(gph),
            jnp.int32(gnv))
        e_re_1, e_im_1 = np.asarray(e_re_1), np.asarray(e_im_1)
        e_re_s, e_im_s = _run_sharded_eloc(dt, qs, qla, qph)
        e_re_s, e_im_s = np.asarray(e_re_s), np.asarray(e_im_s)
        pos = np.searchsorted(gs, qs.reshape(-1)).reshape(qs.shape)
        for d in range(8):
            nu = nus[d]
            np.testing.assert_allclose(
                e_re_s[d, :nu], e_re_1[pos[d, :nu]],
                rtol=2e-6, atol=2e-6, err_msg=f"{label} re shard {d}")
            np.testing.assert_allclose(
                e_im_s[d, :nu], e_im_1[pos[d, :nu]],
                rtol=2e-6, atol=2e-6, err_msg=f"{label} im shard {d}")
