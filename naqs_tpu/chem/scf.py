"""Restricted Hartree-Fock + MO integrals (OpenFermion conventions).

Together with chem/integrals.py and chem/basis.py this replaces the Psi4
solve in the reference's data notebook (notebooks/
generate_molecular_data_and_baselines.ipynb): given a geometry it produces
the canonical RHF orbitals, the MO-basis one_body_integrals /
two_body_integrals in exactly the layout the stored hdf5 files use
(physicist index order h2[p,q,r,s] = (ps|qr) in chemist notation, matching
src/utils/system.py's MolecularData consumer), the HF and MP2 energies,
and — through naqs_tpu.jw + the existing exact-diagonalization machinery —
the FCI baseline.

Host-side NumPy: one-time offline generation, seconds per sto-3g molecule.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np

from naqs_tpu.chem.basis import ATOMIC_NUMBER, build_basis
from naqs_tpu.chem.integrals import (
    ANGSTROM_TO_BOHR, build_integrals, nuclear_repulsion)


@dataclass
class RHFResult:
    e_hf: float
    e_nuc: float
    mo_coeff: np.ndarray        # (n_ao, n_mo) columns = canonical orbitals
    orbital_energies: np.ndarray
    one_body_mo: np.ndarray     # (n_mo, n_mo) spatial h_pq
    two_body_mo: np.ndarray     # (n_mo,)*4, h2[p,q,r,s] = (ps|qr)_chem
    e_mp2: float
    n_electrons: int
    multiplicity: int = 1
    n_alpha: int = 0            # filled for open shell (rohf)
    n_beta: int = 0


def _scf_loop(h_core, g, x, s_mat, n_occ, f0, max_iter, conv, diis_len,
              n_damped=12):
    """One SCF attempt from initial Fock f0: damped warm-up then DIIS.
    Returns (e_el, dm) or None if not converged."""

    def fock(dm):
        j = np.einsum("pqrs,rs->pq", g, dm)
        k = np.einsum("prqs,rs->pq", g, dm)
        return h_core + j - 0.5 * k

    f = f0
    errs: List[np.ndarray] = []
    focks: List[np.ndarray] = []
    e_old = 0.0
    for it in range(max_iter):
        eps, c_ortho = np.linalg.eigh(x.T @ f @ x)
        c = x @ c_ortho
        c_occ = c[:, :n_occ]
        dm = 2.0 * c_occ @ c_occ.T
        f_new = fock(dm)
        e_el = 0.5 * np.sum(dm * (h_core + f_new))
        err = x.T @ (f_new @ dm @ s_mat - s_mat @ dm @ f_new) @ x
        if it < n_damped:
            # plain damping first: DIIS from the core guess can lock onto
            # aufbau saddles (observed: N2 sto-3g stalls 0.71 Ha high)
            f = 0.5 * f + 0.5 * f_new
            e_old = e_el
            continue
        errs.append(err)
        focks.append(f_new.copy())
        if len(errs) > diis_len:
            errs.pop(0)
            focks.pop(0)
        f = f_new
        if len(errs) >= 2:
            m = len(errs)
            b = -np.ones((m + 1, m + 1))
            b[m, m] = 0.0
            for i in range(m):
                for j in range(m):
                    b[i, j] = np.sum(errs[i] * errs[j])
            rhs = np.zeros(m + 1)
            rhs[m] = -1.0
            try:
                w = np.linalg.solve(b, rhs)[:m]
                f = sum(wi * fi for wi, fi in zip(w, focks))
            except np.linalg.LinAlgError:
                pass
        if abs(e_el - e_old) < conv and np.max(np.abs(err)) < 1e-8:
            return e_el, dm
        e_old = e_el
    return None


def _to_spherical(basis, s_mat, t_mat, v_mat, g):
    """Reduce cartesian-d AO integrals to the real-spherical AO space
    (integrals.spherical_d_transform); no-op for pure s/p bases."""
    from naqs_tpu.chem.integrals import spherical_d_transform

    t = spherical_d_transform(basis)
    if t is None:
        return s_mat, t_mat, v_mat, g
    s_mat = t @ s_mat @ t.T
    t_mat = t @ t_mat @ t.T
    v_mat = t @ v_mat @ t.T
    g = np.einsum("pi,qj,rk,sl,ijkl->pqrs", t, t, t, t, g, optimize=True)
    return s_mat, t_mat, v_mat, g


def rhf(
    symbols: Sequence[str],
    positions_angstrom: np.ndarray,
    charge: int = 0,
    max_iter: int = 300,
    conv: float = 1e-11,
    diis_len: int = 8,
    n_guesses: int = 3,
    basis_name: str = "sto-3g",
) -> RHFResult:
    """Closed-shell RHF with DIIS, then the MO-basis integral transform.

    Multiple initial guesses (core Hamiltonian + seeded symmetry-breaking
    perturbations) are converged and the lowest SCF solution kept: the
    bare core guess can converge onto an aufbau saddle for systems with
    near-degenerate valence shells (N2 sto-3g sits 0.71 Ha high there).

    Open-shell systems (O2/CH2 in the zoo, multiplicity 3) need ROHF and
    are not generated here; their stored hdf5 data remains the source.
    """
    centers = np.asarray(positions_angstrom, dtype=np.float64) * ANGSTROM_TO_BOHR
    charges = [float(ATOMIC_NUMBER[s]) for s in symbols]
    n_elec = int(sum(charges)) - charge
    if n_elec % 2:
        raise ValueError("rhf() handles closed shells only (even electrons)")
    n_occ = n_elec // 2

    basis = build_basis(symbols, centers, basis_name)
    s_mat, t_mat, v_mat, g = build_integrals(basis, charges, centers)
    s_mat, t_mat, v_mat, g = _to_spherical(basis, s_mat, t_mat, v_mat, g)
    h_core = t_mat + v_mat
    e_nuc = nuclear_repulsion(charges, centers)

    # symmetric (Loewdin) orthogonalization
    s_val, s_vec = np.linalg.eigh(s_mat)
    x = s_vec @ np.diag(s_val**-0.5) @ s_vec.T

    def fock(dm):
        j = np.einsum("pqrs,rs->pq", g, dm)
        k = np.einsum("prqs,rs->pq", g, dm)
        return h_core + j - 0.5 * k

    best = None
    rng = np.random.default_rng(0)
    scale = np.abs(h_core).max()
    for attempt in range(n_guesses):
        f0 = h_core.copy()
        if attempt > 0:
            pert = rng.normal(size=h_core.shape) * (2e-2 * scale)
            f0 = f0 + 0.5 * (pert + pert.T)
        got = _scf_loop(h_core, g, x, s_mat, n_occ, f0, max_iter, conv,
                        diis_len)
        if got is not None and (best is None or got[0] < best[0] - 1e-10):
            best = got
    if best is None:
        raise RuntimeError("RHF did not converge from any initial guess")
    _e_el, dm = best

    # final canonical orbitals from the converged Fock
    eps, c_ortho = np.linalg.eigh(x.T @ fock(dm) @ x)
    c = x @ c_ortho
    dm = 2.0 * c[:, :n_occ] @ c[:, :n_occ].T
    e_hf = 0.5 * np.sum(dm * (h_core + fock(dm))) + e_nuc

    # MO transform
    h1 = c.T @ h_core @ c
    eri_mo = np.einsum("pqrs,pa->aqrs", g, c, optimize=True)
    eri_mo = np.einsum("aqrs,qb->abrs", eri_mo, c, optimize=True)
    eri_mo = np.einsum("abrs,rc->abcs", eri_mo, c, optimize=True)
    eri_mo = np.einsum("abcs,sd->abcd", eri_mo, c, optimize=True)
    # OpenFermion MolecularData layout: h2[p,q,r,s] = <pq|sr> physicist
    #                                              = (ps|qr) chemist
    two_body = np.transpose(eri_mo, (0, 2, 3, 1))

    # closed-shell MP2 from spatial MO ERIs (reference stores mp2_energy)
    n_mo = h1.shape[0]
    occ, vir = slice(0, n_occ), slice(n_occ, n_mo)
    ov = eri_mo[occ, vir, occ, vir]  # (ia|jb) chemist
    denom = (eps[occ, None, None, None] - eps[None, vir, None, None]
             + eps[None, None, occ, None] - eps[None, None, None, vir])
    e_mp2 = float(np.einsum("iajb,iajb->", ov * (2 * ov - np.swapaxes(ov, 1, 3)),
                            1.0 / denom))

    return RHFResult(
        e_hf=float(e_hf), e_nuc=float(e_nuc), mo_coeff=c,
        orbital_energies=eps, one_body_mo=h1, two_body_mo=two_body,
        e_mp2=float(e_hf + e_mp2), n_electrons=n_elec,
    )


def rohf(
    symbols: Sequence[str],
    positions_angstrom: np.ndarray,
    charge: int = 0,
    multiplicity: int = 3,
    max_iter: int = 400,
    conv: float = 1e-11,
    diis_len: int = 8,
    n_guesses: int = 3,
    basis_name: str = "sto-3g",
) -> RHFResult:
    """Restricted open-shell HF (Guest-Saunders effective Fock) + MO
    transform — the open-shell half of the Psi4 replacement (the reference
    zoo's O2/CH2 are multiplicity-3 ROHF references, notebooks data cells).

    One spatial-orbital set for both spins (like Psi4's ROHF), so the MO
    integrals drop into the same JW mapping as the closed-shell path; the
    open-shell (alpha-only) orbitals are the n_alpha-n_beta highest
    occupied. DIIS on the effective-Fock commutator; multiple seeded
    guesses keep near-degenerate shells off aufbau saddles.
    """
    centers = np.asarray(positions_angstrom, dtype=np.float64) * ANGSTROM_TO_BOHR
    charges = [float(ATOMIC_NUMBER[s]) for s in symbols]
    n_elec = int(sum(charges)) - charge
    n_open = multiplicity - 1
    if (n_elec - n_open) % 2:
        raise ValueError("electron count inconsistent with multiplicity")
    n_beta = (n_elec - n_open) // 2
    n_alpha = n_beta + n_open

    basis = build_basis(symbols, centers, basis_name)
    s_mat, t_mat, v_mat, g = build_integrals(basis, charges, centers)
    s_mat, t_mat, v_mat, g = _to_spherical(basis, s_mat, t_mat, v_mat, g)
    h_core = t_mat + v_mat
    e_nuc = nuclear_repulsion(charges, centers)
    s_val, s_vec = np.linalg.eigh(s_mat)
    x = s_vec @ np.diag(s_val**-0.5) @ s_vec.T
    n_ao = h_core.shape[0]

    def jk(dm):
        return (np.einsum("pqrs,rs->pq", g, dm),
                np.einsum("prqs,rs->pq", g, dm))

    def run_attempt(f0):
        """Returns (e_hf_electronic, c) or None."""
        # initial orbitals from the seed Fock
        _, c_o = np.linalg.eigh(x.T @ f0 @ x)
        c = x @ c_o
        errs, focks = [], []
        e_old, f_eff_prev = 0.0, None
        for it in range(max_iter):
            ca, cb = c[:, :n_alpha], c[:, :n_beta]
            da, db = ca @ ca.T, cb @ cb.T
            ja, ka = jk(da)
            jb, kb = jk(db)
            fa = h_core + ja + jb - ka
            fb = h_core + ja + jb - kb
            e_el = 0.5 * (np.sum((da + db) * h_core)
                          + np.sum(da * fa) + np.sum(db * fb))

            # Guest-Saunders effective Fock in the current MO basis
            fa_mo = c.T @ fa @ c
            fb_mo = c.T @ fb @ c
            avg = 0.5 * (fa_mo + fb_mo)
            f_eff = avg.copy()
            cl = slice(0, n_beta)            # closed (doubly occupied)
            op = slice(n_beta, n_alpha)      # open (alpha only)
            vt = slice(n_alpha, n_ao)        # virtual
            f_eff[cl, op] = fb_mo[cl, op]
            f_eff[op, cl] = fb_mo[op, cl]
            f_eff[op, vt] = fa_mo[op, vt]
            f_eff[vt, op] = fa_mo[vt, op]
            # back to AO (via S c): F_ao = S c F_mo c^T S
            f_ao = s_mat @ c @ f_eff @ c.T @ s_mat

            err = x.T @ (f_ao @ (da + db) @ s_mat
                         - s_mat @ (da + db) @ f_ao) @ x
            errs.append(err)
            focks.append(f_ao.copy())
            if len(errs) > diis_len:
                errs.pop(0), focks.pop(0)
            f_use = f_ao
            if it >= 8 and len(errs) >= 2:
                m = len(errs)
                b = -np.ones((m + 1, m + 1))
                b[m, m] = 0.0
                for i in range(m):
                    for j_ in range(m):
                        b[i, j_] = np.sum(errs[i] * errs[j_])
                rhs = np.zeros(m + 1)
                rhs[m] = -1.0
                try:
                    w = np.linalg.solve(b, rhs)[:m]
                    f_use = sum(wi * fi for wi, fi in zip(w, focks))
                except np.linalg.LinAlgError:
                    pass
            elif it < 8 and f_eff_prev is not None:
                f_use = 0.5 * f_use + 0.5 * f_eff_prev
            f_eff_prev = f_use
            _, c_o = np.linalg.eigh(x.T @ f_use @ x)
            c = x @ c_o
            if abs(e_el - e_old) < conv and np.max(np.abs(err)) < 1e-8:
                return e_el, c
            e_old = e_el
        return None

    # Prefer the symmetry-adapted core-guess solution: for degenerate open
    # shells (O2's half-filled pi_g* pair) seeded perturbations converge
    # onto a symmetry-BROKEN ROHF ~4 mHa lower, but the physical (and
    # Psi4-stored) reference is the adapted one — the core guess reproduces
    # Psi4's O2 hf_energy to 5e-8 Ha. Perturbed guesses are only a
    # fallback against outright non-convergence.
    best = run_attempt(h_core.copy())
    if best is None:
        rng = np.random.default_rng(0)
        scale = np.abs(h_core).max()
        for attempt in range(1, n_guesses):
            pert = rng.normal(size=h_core.shape) * (2e-2 * scale)
            got = run_attempt(h_core + 0.5 * (pert + pert.T))
            if got is not None and (best is None or got[0] < best[0] - 1e-10):
                best = got
    if best is None:
        raise RuntimeError("ROHF did not converge from any initial guess")
    e_el, c = best
    e_hf = e_el + e_nuc

    # canonical-ish orbital energies: diagonal of the converged effective
    # Fock in its own eigenbasis (Psi4 reports the same GS canonicalization)
    ca, cb = c[:, :n_alpha], c[:, :n_beta]
    da, db = ca @ ca.T, cb @ cb.T
    ja, ka = jk(da)
    jb, kb = jk(db)
    fa = h_core + ja + jb - ka
    fb = h_core + ja + jb - kb
    eps = np.diag(0.5 * c.T @ (fa + fb) @ c).copy()

    h1 = c.T @ h_core @ c
    eri_mo = np.einsum("pqrs,pa->aqrs", g, c, optimize=True)
    eri_mo = np.einsum("aqrs,qb->abrs", eri_mo, c, optimize=True)
    eri_mo = np.einsum("abrs,rc->abcs", eri_mo, c, optimize=True)
    eri_mo = np.einsum("abcs,sd->abcd", eri_mo, c, optimize=True)
    two_body = np.transpose(eri_mo, (0, 2, 3, 1))

    return RHFResult(
        e_hf=float(e_hf), e_nuc=float(e_nuc), mo_coeff=c,
        orbital_energies=eps, one_body_mo=h1, two_body_mo=two_body,
        e_mp2=float("nan"), n_electrons=n_elec,
        multiplicity=multiplicity, n_alpha=n_alpha, n_beta=n_beta,
    )
