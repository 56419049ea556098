"""Sampler tests: physicality, count conservation, frequency ~ |psi|^2."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from naqs_tpu import Hilbert, load_molecule
from naqs_tpu.models.nade import NAQSConfig, init_params, log_psi
from naqs_tpu.ops.multinomial import multinomial4
from naqs_tpu.sampler import sample
from naqs_tpu.utils.bits import SENTINEL


def test_multinomial4_conserves_and_distributes():
    key = jax.random.key(0)
    counts = jnp.asarray([1e6, 0.0, 17.0, 1e12])
    probs = jnp.asarray(
        [[0.1, 0.2, 0.3, 0.4], [0.25] * 4, [0.0, 0.0, 1.0, 0.0], [0.5, 0.5, 0.0, 0.0]]
    )
    out = np.asarray(multinomial4(key, counts, probs))
    np.testing.assert_allclose(out.sum(-1), np.asarray(counts))
    assert out[2, 2] == 17.0 and out[2, [0, 1, 3]].sum() == 0
    np.testing.assert_allclose(out[0] / 1e6, [0.1, 0.2, 0.3, 0.4], atol=2e-3)
    assert out[3, 2] == 0 and out[3, 3] == 0


def _setup(name="LiH", **kw):
    mol = load_molecule(name, load_hamiltonian=False)
    h = Hilbert.for_molecule(mol)
    defaults = dict(
        n_qubits=mol.n_qubits, sectors=h.sectors,
        amp_hidden=(16,), phase_hidden=(8,), masking="full",
    )
    defaults.update(kw)
    cfg = NAQSConfig(**defaults)
    params = init_params(jax.random.key(11), cfg)
    return mol, h, cfg, params


def test_sampler_physical_and_conserving():
    mol, h, cfg, params = _setup()
    n = 1e6
    batch = sample(cfg, params, jax.random.key(1), jnp.float64(n), capacity=256)
    states = np.asarray(batch.states)
    counts = np.asarray(batch.counts)
    nu = int(batch.n_unique)
    assert not bool(batch.overflow)
    assert nu <= h.size
    # all non-padding states physical and unique-sorted
    live = states[:nu]
    assert np.all(np.diff(live.astype(np.uint64)) > 0)
    assert np.all(h.contains(live))
    assert np.all(states[nu:] == SENTINEL)
    assert np.all(counts[nu:] == 0)
    # full masking: no samples discarded
    np.testing.assert_allclose(counts.sum(), n)


def test_sampler_frequencies_match_psi2():
    mol, h, cfg, params = _setup()
    n = 2e6
    batch = sample(cfg, params, jax.random.key(2), jnp.float64(n), capacity=256)
    nu = int(batch.n_unique)
    live = np.asarray(batch.states[:nu])
    freqs = np.asarray(batch.counts[:nu]) / n

    la, _ = log_psi(cfg, params, jnp.asarray(h.basis))
    p = np.asarray(jnp.exp(2 * la), dtype=np.float64)
    p /= p.sum()
    p_map = dict(zip(h.basis.tolist(), p.tolist()))
    p_live = np.array([p_map[s] for s in live.tolist()])
    # every state with decent mass must be sampled, freq close to prob
    err = np.abs(freqs - p_live)
    tol = 4.0 * np.sqrt(p_live * (1 - p_live) / n) + 5e-5
    assert np.all(err < tol), (err.max(), tol.min())
    # total sampled mass accounts for nearly everything
    assert freqs.sum() > 0.999


def test_sampler_overflow_flag():
    mol, h, cfg, params = _setup()
    batch = sample(cfg, params, jax.random.key(3), jnp.float64(1e6), capacity=32)
    assert bool(batch.overflow)  # 225-state basis at flat-ish init > 32 uniques


def test_sampler_partial_masking_discards_unphysical():
    mol, h, cfg, params = _setup(masking="partial")
    n = 1e5
    batch = sample(cfg, params, jax.random.key(4), jnp.float64(n), capacity=512)
    nu = int(batch.n_unique)
    live = np.asarray(batch.states[:nu])
    assert np.all(h.contains(live))  # discarded, never returned
    assert float(np.asarray(batch.counts).sum()) < n  # some mass dropped
