"""From-scratch closed-shell CCSD in the spin-orbital basis.

Completes the offline baseline pipeline: the reference's data notebook
(notebooks/generate_molecular_data_and_baselines.ipynb) stores Psi4
scf/mp2/ccsd/fci energies per molecule; `naqs_tpu.chem` re-derives HF/MP2
(chem.scf), FCI (exact sector diagonalization of our JW Hamiltonian), and —
with this module — CCSD, so a generated molecule folder carries the same
baseline set as the shipped data.

Implementation: standard spin-orbital CCSD with the Stanton-Gauss-Watts-
Bartlett intermediates (J. Chem. Phys. 94, 4334 (1991)), solved by damped
iteration with DIIS extrapolation on the stacked (t1, t2) residuals. The
problem sizes here are tiny (<= ~56 spin orbitals), so plain dense einsum
contractions on the host are the right tool — no device code. Energies
validate against the stored Psi4 ccsd_energy values to ~1e-6 Ha
(tests/test_cc.py); for 2-electron systems CCSD == FCI which pins the
implementation to machine precision.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class CCSDResult:
    e_ccsd: float           # total energy (HF + correlation)
    e_corr: float           # CCSD correlation energy
    n_iter: int
    converged: bool
    t1: np.ndarray          # (nocc_so, nvir_so) single amplitudes
    t2: np.ndarray          # (nocc_so, nocc_so, nvir_so, nvir_so)


def _spin_orbital_integrals(one_body_mo, two_body_mo):
    """Spatial MO integrals -> spin-orbital h1 and antisymmetrized <pq||rs>.

    two_body_mo uses the stored-hdf5 (OpenFermion) layout
    h2[p,q,r,s] = <pq|sr>_phys = (ps|qr)_chem (chem/scf.py:35), so the
    physicist <pq|rs> is h2[p,q,s,r]. Spin orbitals are interleaved
    (2p = alpha, 2p+1 = beta) to match the JW qubit ordering used
    throughout the package.
    """
    n = one_body_mo.shape[0]
    n_so = 2 * n
    phys = np.transpose(two_body_mo, (0, 1, 3, 2))  # <pq|rs>_phys, spatial

    h1 = np.zeros((n_so, n_so))
    h1[0::2, 0::2] = one_body_mo
    h1[1::2, 1::2] = one_body_mo

    # <PQ|RS> = <pq|rs> d(sP,sR) d(sQ,sS)
    eri = np.zeros((n_so, n_so, n_so, n_so))
    for sp in (0, 1):
        for sq in (0, 1):
            eri[sp::2, sq::2, sp::2, sq::2] = phys
    anti = eri - np.transpose(eri, (0, 1, 3, 2))
    return h1, anti


def ccsd_from_integrals(
    one_body_mo: np.ndarray,
    two_body_mo: np.ndarray,
    n_electrons: int,
    e_hf: float,
    e_nuc: float,
    max_iter: int = 200,
    conv: float = 1e-9,
    diis_depth: int = 8,
    n_alpha: int = None,
    n_beta: int = None,
) -> CCSDResult:
    """Solve CCSD from spatial MO integrals in the stored-hdf5 layout.

    For an open-shell (ROHF) reference pass n_alpha/n_beta: the occupied
    spin orbitals are then alpha 0..n_alpha-1 and beta 0..n_beta-1 (spatial
    indices) rather than the lowest n_electrons interleaved indices. The
    spin-orbital equations keep the full non-canonical Fock (off-diagonal
    occ-occ/virt-virt blocks enter through the Fae/Fmi intermediates and
    f_ov enters T1), so the energy is the standard ROHF-CCSD.
    """
    h1, g = _spin_orbital_integrals(one_body_mo, two_body_mo)
    n_so = h1.shape[0]
    no, nv = n_electrons, n_so - n_electrons
    if n_alpha is not None or n_beta is not None:
        assert n_alpha is not None and n_beta is not None
        assert n_alpha + n_beta == n_electrons
        occ_idx = np.concatenate([2 * np.arange(n_alpha),
                                  2 * np.arange(n_beta) + 1])
        occ_idx = np.sort(occ_idx)
        vir_idx = np.setdiff1d(np.arange(n_so), occ_idx)
        perm = np.concatenate([occ_idx, vir_idx])
        h1 = h1[np.ix_(perm, perm)]
        g = g[np.ix_(perm, perm, perm, perm)]
    o, v = slice(0, no), slice(no, n_so)

    # spin-orbital Fock matrix from the (canonical-RHF) MO integrals;
    # built explicitly rather than from orbital_energies so the solver
    # also accepts non-canonical orbitals.
    f = h1 + np.einsum("piqi->pq", g[:, o, :, o])
    eps = np.diag(f)
    d1 = eps[o, None] - eps[None, v]                      # (no, nv)
    d2 = (eps[o, None, None, None] + eps[None, o, None, None]
          - eps[None, None, v, None] - eps[None, None, None, v])

    f_ov = f[o, v]
    t1 = f_ov / d1
    t2 = g[o, o, v, v] / d2
    e_mp2 = 0.25 * np.einsum("ijab,ijab->", g[o, o, v, v], t2)

    diis_t, diis_r = [], []

    def energy(t1, t2):
        tau = t2 + np.einsum("ia,jb->ijab", t1, t1) \
            - np.einsum("ib,ja->ijab", t1, t1)
        return (np.einsum("ia,ia->", f_ov, t1)
                + 0.25 * np.einsum("ijab,ijab->", g[o, o, v, v], tau))

    e_corr, converged, it = e_mp2, False, 0
    for it in range(1, max_iter + 1):
        tau_t = t2 + 0.5 * (np.einsum("ia,jb->ijab", t1, t1)
                            - np.einsum("ib,ja->ijab", t1, t1))
        tau = t2 + np.einsum("ia,jb->ijab", t1, t1) \
            - np.einsum("ib,ja->ijab", t1, t1)

        # --- Stanton intermediates
        Fae = (f[v, v] - np.diag(np.diag(f[v, v]))
               - 0.5 * np.einsum("me,ma->ae", f_ov, t1)
               + np.einsum("mf,mafe->ae", t1, g[o, v, v, v])
               - 0.5 * np.einsum("mnaf,mnef->ae", tau_t, g[o, o, v, v]))
        Fmi = (f[o, o] - np.diag(np.diag(f[o, o]))
               + 0.5 * np.einsum("ie,me->mi", t1, f_ov)
               + np.einsum("ne,mnie->mi", t1, g[o, o, o, v])
               + 0.5 * np.einsum("inef,mnef->mi", tau_t, g[o, o, v, v]))
        Fme = f_ov + np.einsum("nf,mnef->me", t1, g[o, o, v, v])

        Wmnij = (g[o, o, o, o]
                 + np.einsum("je,mnie->mnij", t1, g[o, o, o, v])
                 - np.einsum("ie,mnje->mnij", t1, g[o, o, o, v])
                 + 0.25 * np.einsum("ijef,mnef->mnij", tau, g[o, o, v, v]))
        Wabef = (g[v, v, v, v]
                 - np.einsum("mb,amef->abef", t1, g[v, o, v, v])
                 + np.einsum("ma,bmef->abef", t1, g[v, o, v, v])
                 + 0.25 * np.einsum("mnab,mnef->abef", tau, g[o, o, v, v]))
        Wmbej = (g[o, v, v, o]
                 + np.einsum("jf,mbef->mbej", t1, g[o, v, v, v])
                 - np.einsum("nb,mnej->mbej", t1, g[o, o, v, o])
                 - np.einsum("jnfb,mnef->mbej",
                             0.5 * t2 + np.einsum("jf,nb->jnfb", t1, t1),
                             g[o, o, v, v]))

        # --- T1 equations
        rhs1 = (f_ov
                + np.einsum("ie,ae->ia", t1, Fae)
                - np.einsum("ma,mi->ia", t1, Fmi)
                + np.einsum("imae,me->ia", t2, Fme)
                - np.einsum("nf,naif->ia", t1, g[o, v, o, v])
                - 0.5 * np.einsum("imef,maef->ia", t2, g[o, v, v, v])
                - 0.5 * np.einsum("mnae,nmei->ia", t2, g[o, o, v, o]))
        t1_new = rhs1 / d1

        # --- T2 equations
        Fae_h = Fae - 0.5 * np.einsum("mb,me->be", t1, Fme)
        Fmi_h = Fmi + 0.5 * np.einsum("je,me->mj", t1, Fme)
        P_ab = np.einsum("ijae,be->ijab", t2, Fae_h)
        P_ij = np.einsum("imab,mj->ijab", t2, Fmi_h)
        rhs2 = (g[o, o, v, v]
                + P_ab - np.transpose(P_ab, (0, 1, 3, 2))
                - P_ij + np.transpose(P_ij, (1, 0, 2, 3))
                + 0.5 * np.einsum("mnab,mnij->ijab", tau, Wmnij)
                + 0.5 * np.einsum("ijef,abef->ijab", tau, Wabef))
        P_mbej = (np.einsum("imae,mbej->ijab", t2, Wmbej)
                  - np.einsum("ie,ma,mbej->ijab", t1, t1, g[o, v, v, o]))
        P_mbej = (P_mbej
                  - np.transpose(P_mbej, (0, 1, 3, 2))
                  - np.transpose(P_mbej, (1, 0, 2, 3))
                  + np.transpose(P_mbej, (1, 0, 3, 2)))
        rhs2 = rhs2 + P_mbej
        P_ie = np.einsum("ie,abej->ijab", t1, g[v, v, v, o])
        rhs2 = rhs2 + P_ie - np.transpose(P_ie, (1, 0, 2, 3))
        P_ma = np.einsum("ma,mbij->ijab", t1, g[o, v, o, o])
        rhs2 = rhs2 - P_ma + np.transpose(P_ma, (0, 1, 3, 2))
        t2_new = rhs2 / d2

        r1, r2 = t1_new - t1, t2_new - t2
        rnorm = np.sqrt(np.sum(r1 ** 2) + np.sum(r2 ** 2))

        # --- DIIS on the stacked amplitude vector
        diis_t.append(np.concatenate([t1_new.ravel(), t2_new.ravel()]))
        diis_r.append(np.concatenate([r1.ravel(), r2.ravel()]))
        if len(diis_t) > diis_depth:
            diis_t.pop(0), diis_r.pop(0)
        if len(diis_t) >= 2:
            k = len(diis_r)
            B = np.full((k + 1, k + 1), -1.0)
            B[-1, -1] = 0.0
            for a in range(k):
                for b in range(k):
                    B[a, b] = diis_r[a] @ diis_r[b]
            rhs = np.zeros(k + 1)
            rhs[-1] = -1.0
            try:
                c = np.linalg.solve(B, rhs)[:k]
                ext = sum(ci * ti for ci, ti in zip(c, diis_t))
                t1_new = ext[: t1.size].reshape(t1.shape)
                t2_new = ext[t1.size:].reshape(t2.shape)
            except np.linalg.LinAlgError:
                pass

        t1, t2 = t1_new, t2_new
        e_new = energy(t1, t2)
        if rnorm < conv and abs(e_new - e_corr) < conv:
            e_corr, converged = e_new, True
            break
        e_corr = e_new

    return CCSDResult(
        e_ccsd=float(e_hf + e_corr), e_corr=float(e_corr),
        n_iter=it, converged=converged, t1=t1, t2=t2,
    )


def ccsd(rhf_result, **kw) -> CCSDResult:
    """CCSD from a chem.scf rhf/rohf result (open shell auto-detected)."""
    if getattr(rhf_result, "multiplicity", 1) > 1:
        kw.setdefault("n_alpha", rhf_result.n_alpha)
        kw.setdefault("n_beta", rhf_result.n_beta)
    return ccsd_from_integrals(
        rhf_result.one_body_mo, rhf_result.two_body_mo,
        rhf_result.n_electrons, rhf_result.e_hf, rhf_result.e_nuc, **kw)
