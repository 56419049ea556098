"""Dense sector-grid engine vs the numpy reference-equivalent oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

import naqs_tpu as nq
from naqs_tpu.hamiltonian import local_energy_np
from naqs_tpu.ops.dense_engine import DenseTerms, dense_local_energy
from naqs_tpu.ops.rank import RankSpec


def _setup(name):
    mol = nq.load_molecule(name)
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    assert DenseTerms.supported(terms, h)
    dn = DenseTerms.build(terms, h)
    spec = RankSpec.for_hilbert(h)
    return mol, h, terms, dn, spec


@pytest.mark.parametrize("name,m", [("LiH", 100), ("H2O", 300)])
def test_dense_matches_numpy_subset(name, m):
    mol, h, terms, dn, spec = _setup(name)
    rng = np.random.default_rng(0)
    sub = np.sort(rng.choice(h.size, size=m, replace=False))
    states = h.basis[sub]
    la = rng.normal(scale=1.0, size=m)
    la -= la.max()
    ph = rng.uniform(0, 2 * np.pi, size=m)

    # SENTINEL-padded buffer wider than the sample
    cap = m + 28
    buf = np.full((cap,), np.uint64(2**64 - 1), np.uint64)
    buf[:m] = states
    la_b = np.zeros(cap, np.float32)
    la_b[:m] = la
    ph_b = np.zeros(cap, np.float32)
    ph_b[:m] = ph

    e_re, e_im = dense_local_energy(
        dn, spec, jnp.asarray(buf), jnp.asarray(la_b), jnp.asarray(ph_b),
        jnp.int32(m))

    psi = np.exp(la + 1j * ph)
    e_np = local_energy_np(terms, states, psi)
    np.testing.assert_allclose(
        np.asarray(e_re)[:m], e_np.real, atol=2e-4, rtol=0)
    np.testing.assert_allclose(
        np.asarray(e_im)[:m], e_np.imag, atol=2e-4, rtol=0)


def test_dense_full_space_matches_numpy():
    mol, h, terms, dn, spec = _setup("LiH")
    n = h.size
    rng = np.random.default_rng(1)
    la = (rng.normal(scale=1.0, size=n) - 2.0).astype(np.float64)
    la -= la.max()
    ph = rng.uniform(0, 2 * np.pi, size=n)
    e_re, e_im = dense_local_energy(
        dn, spec, jnp.asarray(h.basis), jnp.asarray(la, dtype=jnp.float32),
        jnp.asarray(ph, dtype=jnp.float32), jnp.int32(n))
    psi = np.exp(la + 1j * ph)
    e_np = local_energy_np(terms, h.basis, psi)
    np.testing.assert_allclose(np.asarray(e_re), e_np.real, atol=2e-4)
    np.testing.assert_allclose(np.asarray(e_im), e_np.imag, atol=2e-4)


def test_dense_agrees_with_rank_engine():
    """Same inputs through both engines (including padding rows)."""
    from naqs_tpu.ops.local_energy import DeviceTerms, local_energy

    mol, h, terms, dn, spec = _setup("LiH")
    dt = DeviceTerms.from_terms(terms, hilbert=h)
    m = 60
    rng = np.random.default_rng(2)
    sub = np.sort(rng.choice(h.size, size=m, replace=False))
    cap = 64
    buf = np.full((cap,), np.uint64(2**64 - 1), np.uint64)
    buf[:m] = h.basis[sub]
    la = np.zeros(cap, np.float32)
    la[:m] = rng.normal(size=m) - 1.0
    ph = np.zeros(cap, np.float32)
    ph[:m] = rng.uniform(0, 2 * np.pi, size=m)
    args = (jnp.asarray(buf), jnp.asarray(la), jnp.asarray(ph), jnp.int32(m))
    e1_re, e1_im = local_energy(dt, *args)
    e2_re, e2_im = dense_local_energy(dn, spec, *args)
    np.testing.assert_allclose(
        np.asarray(e1_re)[:m], np.asarray(e2_re)[:m], atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(e1_im)[:m], np.asarray(e2_im)[:m], atol=2e-4)


@pytest.mark.parametrize("name,m", [("LiH", 80), ("H2O", 250)])
def test_factored_matches_numpy(name, m):
    """FactorTerms is built for mid-size spaces, but the code path is
    size-independent -- verify it on small molecules against the oracle."""
    from naqs_tpu.ops.dense_engine import FactorTerms, factored_local_energy

    mol, h, terms, dn, spec = _setup(name)
    assert FactorTerms.supported(terms, h)
    fn = FactorTerms.build(terms, h)
    rng = np.random.default_rng(7)
    sub = np.sort(rng.choice(h.size, size=m, replace=False))
    cap = m + 12
    buf = np.full((cap,), np.uint64(2**64 - 1), np.uint64)
    buf[:m] = h.basis[sub]
    la = np.zeros(cap, np.float32)
    la[:m] = rng.normal(size=m) - 1.0
    ph = np.zeros(cap, np.float32)
    ph[:m] = rng.uniform(0, 2 * np.pi, size=m)
    e_re, e_im = factored_local_energy(
        fn, spec, jnp.asarray(buf), jnp.asarray(la), jnp.asarray(ph),
        jnp.int32(m))
    psi = np.exp(la[:m].astype(np.float64) + 1j * ph[:m].astype(np.float64))
    e_np = local_energy_np(terms, buf[:m], psi)
    np.testing.assert_allclose(np.asarray(e_re)[:m], e_np.real, atol=2e-4)
    np.testing.assert_allclose(np.asarray(e_im)[:m], e_np.imag, atol=2e-4)


class TestFactorXL:
    """Exc-blocked staircase engine for n_exc_max-filtered sectors."""

    def _setup(self, name="LiH", n_exc=2):
        import naqs_tpu as nq

        mol = nq.load_molecule(name)
        h = nq.Hilbert.for_molecule(mol)
        h = nq.Hilbert(n_qubits=h.n_qubits, sectors=h.sectors, n_exc_max=n_exc)
        terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits,
                                       n_excitations_max=n_exc)
        return mol, h, terms

    def test_dispatch_and_block_geometry(self):
        from naqs_tpu.ops.dense_engine import DENSE_SIZE_MAX, FactorTermsXL
        from naqs_tpu.ops.local_energy import DeviceTerms

        mol, h, terms = self._setup()
        # force past the DenseTerms and FactorTerms small-space paths
        import naqs_tpu.ops.dense_engine as de
        old = de.DENSE_SIZE_MAX, de.FACT_SIZE_MAX
        de.DENSE_SIZE_MAX = de.FACT_SIZE_MAX = 1
        try:
            dt = DeviceTerms.from_terms(terms, hilbert=h)
        finally:
            de.DENSE_SIZE_MAX, de.FACT_SIZE_MAX = old
        assert isinstance(dt.dense, FactorTermsXL)
        xl = dt.dense
        assert xl.n_cells == len(h.basis)
        # staircase cells = sum over alpha blocks of |A_k| * prefix(E-k)
        tot = sum(cnt * pw for (_, cnt, pw) in xl.blocks)
        assert tot == xl.n_cells

    def test_matches_rank_engine_sampled(self):
        import dataclasses

        from naqs_tpu.ops.dense_engine import FactorTermsXL
        from naqs_tpu.ops.local_energy import DeviceTerms, local_energy
        from naqs_tpu.utils.bits import SENTINEL

        mol, h, terms = self._setup()
        import naqs_tpu.ops.dense_engine as de
        old = de.DENSE_SIZE_MAX, de.FACT_SIZE_MAX
        de.DENSE_SIZE_MAX = de.FACT_SIZE_MAX = 1
        try:
            dt_xl = DeviceTerms.from_terms(terms, hilbert=h)
        finally:
            de.DENSE_SIZE_MAX, de.FACT_SIZE_MAX = old
        assert isinstance(dt_xl.dense, FactorTermsXL)
        dt_rank = dataclasses.replace(dt_xl, dense=None)

        rng = np.random.default_rng(5)
        basis = np.asarray(h.basis, np.uint64)
        cap, nu = 64, 49
        sel = np.sort(rng.choice(len(basis), size=nu, replace=False))
        states = np.full(cap, SENTINEL, np.uint64)
        states[:nu] = basis[sel]
        la = rng.normal(size=cap).astype(np.float32) - 1.0
        ph = rng.normal(size=cap).astype(np.float32)
        args = (jnp.asarray(states), jnp.asarray(la), jnp.asarray(ph),
                jnp.int32(nu))
        r_xl = local_energy(dt_xl, *args)
        r_rk = local_energy(dt_rank, *args)
        np.testing.assert_allclose(np.asarray(r_xl[0])[:nu],
                                   np.asarray(r_rk[0])[:nu],
                                   rtol=2e-6, atol=2e-6)
        np.testing.assert_allclose(np.asarray(r_xl[1])[:nu],
                                   np.asarray(r_rk[1])[:nu],
                                   rtol=2e-6, atol=2e-6)

    def test_exact_ground_state_energy(self):
        """Full filtered basis in the table: <E_loc> under |psi|^2 weights of
        the CISD ground eigenvector = the CISD eigenvalue."""
        import dataclasses

        from scipy.sparse.linalg import eigsh

        import naqs_tpu as nq
        from naqs_tpu.hamiltonian import assemble_sparse_hamiltonian_np
        from naqs_tpu.ops.dense_engine import FactorTermsXL
        from naqs_tpu.ops.local_energy import DeviceTerms, local_energy

        mol, h, terms = self._setup()
        basis = np.asarray(h.basis, np.uint64)
        H = assemble_sparse_hamiltonian_np(terms, basis)
        w, v = eigsh(H, k=1, which="SA")
        e0, vec = w[0], np.abs(v[:, 0]) + 1e-12
        import naqs_tpu.ops.dense_engine as de
        old = de.DENSE_SIZE_MAX, de.FACT_SIZE_MAX
        de.DENSE_SIZE_MAX = de.FACT_SIZE_MAX = 1
        try:
            dt = DeviceTerms.from_terms(terms, hilbert=h)
        finally:
            de.DENSE_SIZE_MAX, de.FACT_SIZE_MAX = old
        assert isinstance(dt.dense, FactorTermsXL)
        la = np.log(vec).astype(np.float32)
        ph = np.where(v[:, 0] >= 0, 0.0, np.pi).astype(np.float32)
        e_re, e_im = local_energy(dt, jnp.asarray(basis), jnp.asarray(la),
                                  jnp.asarray(ph), jnp.int32(len(basis)))
        e = float(np.sum(v[:, 0] ** 2 * np.asarray(e_re)))
        assert abs(e - e0) < 5e-6, (e, e0)

    def test_out_of_staircase_query_gets_true_diagonal(self):
        """A partial-mask sampler can emit in-sector states past the n_exc
        filter; their E_loc must be the true diagonal (DenseTerms semantics),
        not the staircase sentinel's 0 — a zero row biases a count-weighted
        mean by ~|E| per unit leaked count."""
        import naqs_tpu as nq
        from naqs_tpu.hamiltonian import diagonal_energy_np
        from naqs_tpu.ops.dense_engine import FactorTermsXL
        from naqs_tpu.ops.local_energy import DeviceTerms, local_energy
        from naqs_tpu.utils.bits import SENTINEL

        mol, h, terms = self._setup()
        import naqs_tpu.ops.dense_engine as de
        old = de.DENSE_SIZE_MAX, de.FACT_SIZE_MAX
        de.DENSE_SIZE_MAX = de.FACT_SIZE_MAX = 1
        try:
            dt = DeviceTerms.from_terms(terms, hilbert=h)
        finally:
            de.DENSE_SIZE_MAX, de.FACT_SIZE_MAX = old
        assert isinstance(dt.dense, FactorTermsXL)

        h_full = nq.Hilbert.for_molecule(mol)
        in_basis = set(np.asarray(h.basis).tolist())
        out = np.array(
            [s for s in np.asarray(h_full.basis).tolist()
             if s not in in_basis][:3], np.uint64)
        basis = np.asarray(h.basis, np.uint64)
        cap = 64
        states = np.full(cap, SENTINEL, np.uint64)
        mix = np.sort(np.concatenate([basis[:8], out]))
        states[: len(mix)] = mix
        la = np.zeros(cap, np.float32)
        ph = np.zeros(cap, np.float32)
        e_re, _ = local_energy(dt, jnp.asarray(states), jnp.asarray(la),
                               jnp.asarray(ph), jnp.int32(len(mix)))
        e_re = np.asarray(e_re)
        diag_oracle = diagonal_energy_np(terms, out)
        for s_, d in zip(out.tolist(), diag_oracle):
            i = int(np.searchsorted(mix, np.uint64(s_)))
            np.testing.assert_allclose(e_re[i], d, rtol=0, atol=1e-9)
