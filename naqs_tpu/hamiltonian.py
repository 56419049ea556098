"""Jordan-Wigner Pauli-string Hamiltonian: term compilation and host oracles.

A qubit Hamiltonian is a dict {((qubit, 'X'|'Y'|'Z'), ...): coeff}. Each
Pauli string P_k acting on basis state |s> (s a packed occupation bitstring)
gives exactly one coupled state |s ^ xy_k> with matrix element

    <s ^ xy_k| P_k |s> = c_k * (-1)^{popcount(s & yz_k)}

where xy_k has bits at X/Y sites (the flip mask), yz_k has bits at Y/Z sites
(the sign mask), and c_k = (i^{n_Y} * coeff) which is real for Hermitian
Hamiltonians with real orbitals (n_Y is always even).

This compilation mirrors the semantics of the reference's coupling
pre-processing (reference: src/optimizer/hamiltonian.py:373-430) but targets
a gather/parity local-energy engine instead of an incrementally-assembled
SciPy CSR matrix: terms are flat arrays (xy, yz, coeff) plus dedup'd unique
XY / YZ masks and group indices, uploaded once to device.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np

from naqs_tpu.utils.bits import np_parity_pm1

PauliTermDict = Dict[Tuple[Tuple[int, str], ...], complex]


@dataclass(frozen=True)
class PauliTerms:
    """Compiled Pauli-string Hamiltonian (host numpy; device upload is trivial).

    Diagonal terms (xy == 0, including the identity) are kept separate from
    off-diagonal ones so the local-energy engine can accumulate the diagonal
    in f64 (it carries ~|E| ~ 1e2-1e3 Ha) while the off-diagonal part (the
    ~0.1 Ha correlation physics) runs in f32/c64 on the MXU/VPU.
    """

    n_qubits: int
    # diagonal part: E_diag(s) = sum_k dcoeff[k] * parity(s & dyz[k])
    diag_yz: np.ndarray      # (Kd,) uint64
    diag_coeff: np.ndarray   # (Kd,) float64
    # off-diagonal part, flattened over terms
    xy: np.ndarray           # (K,) uint64 flip masks (never 0)
    yz: np.ndarray           # (K,) uint64 sign masks
    coeff: np.ndarray        # (K,) float64
    # dedup'd structures
    xy_unique: np.ndarray    # (Kxy,) uint64 sorted unique flip masks
    gxy: np.ndarray          # (K,) int32: index of term k's flip mask in xy_unique
    yz_unique: np.ndarray    # (Kyz,) uint64 sorted unique sign masks (off-diag)
    gyz: np.ndarray          # (K,) int32

    @property
    def n_terms(self) -> int:
        return int(len(self.coeff) + len(self.diag_coeff))

    @property
    def n_unique_xy(self) -> int:
        return int(len(self.xy_unique))


def compile_pauli_terms(
    terms: PauliTermDict,
    n_qubits: int,
    n_excitations_max: Optional[int] = None,
    imag_tol: float = 1e-10,
) -> PauliTerms:
    """Compile a qubit-operator term dict into flat (xy, yz, coeff) arrays.

    n_excitations_max: drop terms with more than this many X/Y sites
    (reference semantics, hamiltonian.py:397-400: each X/Y site counts as one
    excitation unit).
    """
    xys, yzs, coeffs = [], [], []
    for term, coupling in terms.items():
        xy = np.uint64(0)
        yz = np.uint64(0)
        n_y = 0
        n_exc = 0
        valid = True
        for qubit, pauli in term:
            if qubit >= n_qubits:
                raise ValueError(f"term {term} touches qubit {qubit} >= {n_qubits}")
            bit = np.uint64(1) << np.uint64(qubit)
            if pauli in ("X", "Y"):
                xy |= bit
                n_exc += 1
                if pauli == "Y":
                    n_y += 1
                    yz |= bit
                if n_excitations_max is not None and n_exc > n_excitations_max:
                    valid = False
                    break
            elif pauli == "Z":
                yz |= bit
            else:
                raise ValueError(f"unknown Pauli '{pauli}' in term {term}")
        if not valid:
            continue
        if n_y % 2 == 1:
            # Odd-Y strings are anti-Hermitian noise from imperfect integrals;
            # the reference zeroes them via (i**nY).real (hamiltonian.py:416).
            if abs(coupling) > 1e-5:
                raise ValueError(
                    f"large odd-Y (non-Hermitian) term {term}: {coupling}"
                )
            continue
        c = (1j ** n_y) * complex(coupling)
        if abs(c.imag) > imag_tol * max(1.0, abs(c.real)):
            raise ValueError(f"non-Hermitian coupling {c} for term {term}")
        xys.append(xy)
        yzs.append(yz)
        coeffs.append(c.real)

    xys = np.asarray(xys, dtype=np.uint64)
    yzs = np.asarray(yzs, dtype=np.uint64)
    coeffs = np.asarray(coeffs, dtype=np.float64)

    is_diag = xys == 0
    diag_yz, diag_coeff = yzs[is_diag], coeffs[is_diag]
    xy, yz, coeff = xys[~is_diag], yzs[~is_diag], coeffs[~is_diag]

    # merge duplicate diagonal sign-masks
    diag_yz, inv = np.unique(diag_yz, return_inverse=True)
    diag_coeff = np.bincount(inv, weights=diag_coeff, minlength=len(diag_yz))

    # merge duplicate (xy, yz) off-diagonal pairs
    order = np.lexsort((yz, xy))
    xy, yz, coeff = xy[order], yz[order], coeff[order]
    same = np.zeros(len(xy), dtype=bool)
    if len(xy) > 1:
        same[1:] = (xy[1:] == xy[:-1]) & (yz[1:] == yz[:-1])
    group = np.cumsum(~same) - 1
    n_groups = group[-1] + 1 if len(group) else 0
    first = np.flatnonzero(~same)
    xy_m = xy[first]
    yz_m = yz[first]
    coeff_m = np.bincount(group, weights=coeff, minlength=n_groups)
    xy, yz, coeff = xy_m, yz_m, coeff_m

    xy_unique, gxy = np.unique(xy, return_inverse=True)
    yz_unique, gyz = np.unique(yz, return_inverse=True)

    return PauliTerms(
        n_qubits=n_qubits,
        diag_yz=diag_yz.astype(np.uint64),
        diag_coeff=diag_coeff.astype(np.float64),
        xy=xy.astype(np.uint64),
        yz=yz.astype(np.uint64),
        coeff=coeff.astype(np.float64),
        xy_unique=xy_unique.astype(np.uint64),
        gxy=gxy.astype(np.int32),
        yz_unique=yz_unique.astype(np.uint64),
        gyz=gyz.astype(np.int32),
    )


# --------------------------------------------------------------- host oracle

def diagonal_energy_np(terms: PauliTerms, states: np.ndarray) -> np.ndarray:
    """<s|H|s> for packed states (float64)."""
    states = np.asarray(states, dtype=np.uint64)
    par = np_parity_pm1(states[:, None] & terms.diag_yz[None, :]).astype(np.float64)
    return par @ terms.diag_coeff


def assemble_dense_hamiltonian_np(terms: PauliTerms, basis: np.ndarray) -> np.ndarray:
    """Dense H over a (sorted) packed-state basis. Oracle for tests/solve_H.

    Semantics match the reference's on-demand CSR assembly
    (hamiltonian.py:272-370): couplings to states outside `basis` are dropped.
    """
    basis = np.asarray(basis, dtype=np.uint64)
    n = len(basis)
    H = np.zeros((n, n), dtype=np.float64)
    H[np.arange(n), np.arange(n)] = diagonal_energy_np(terms, basis)
    for xy, yz, c in zip(terms.xy, terms.yz, terms.coeff):
        coupled = basis ^ xy
        pos = np.searchsorted(basis, coupled)
        pos_c = np.minimum(pos, n - 1)
        found = basis[pos_c] == coupled
        sign = np_parity_pm1(basis & yz).astype(np.float64)
        rows = np.flatnonzero(found)
        H[rows, pos_c[rows]] += c * sign[rows]
    return H


def _assemble_rows_np(terms: PauliTerms, basis: np.ndarray, r0: int, r1: int):
    """Pure-numpy COO (rows, cols, vals) for basis rows [r0, r1); rows are
    ABSOLUTE indices, columns search the full basis."""
    n = len(basis)
    blk = basis[r0:r1]
    rows = [np.arange(r0, r1, dtype=np.int64)]
    cols = [np.arange(r0, r1, dtype=np.int64)]
    vals = [diagonal_energy_np(terms, blk)]
    for xy in terms.xy_unique:
        sel = terms.xy == xy
        yzs, cs = terms.yz[sel], terms.coeff[sel]
        coupled = blk ^ xy
        pos = np.searchsorted(basis, coupled)
        pos_c = np.minimum(pos, n - 1)
        found = basis[pos_c] == coupled
        idx = np.flatnonzero(found)
        if len(idx) == 0:
            continue
        h = np.zeros(len(idx), dtype=np.float64)
        for yz, c in zip(yzs, cs):
            h += c * np_parity_pm1(blk[idx] & yz)
        rows.append(idx + r0)
        cols.append(pos_c[idx])
        vals.append(h)
    return (np.concatenate(rows), np.concatenate(cols), np.concatenate(vals))


# blocked-assembly row granularity: bounds the worst-case COO staging at
# ~block * (n_masks + 1) * 24 B (a single-shot 1.66M-state assembly of the
# H2O 6-31G sector allocated > 125 GB and was OOM-killed); 2.5e5 rows keeps
# the peak a few GB for every shipped system while amortizing per-block cost
_ASSEMBLE_ROW_BLOCK = 250_000


def assemble_sparse_hamiltonian_blocks(terms: PauliTerms, basis: np.ndarray,
                                       row_block: int = None):
    """H as a list of CSR row-blocks over a sorted packed-state basis.

    Each block keeps int32 indices (per-block nnz < 2^31 at the default
    granularity), so the total footprint is ~12 B/nnz even when the full
    matrix would force int64 indices — and no vstack copy is ever made.
    """
    import scipy.sparse as sp

    from naqs_tpu import native

    basis = np.asarray(basis, dtype=np.uint64)
    n = len(basis)
    if row_block is None:
        row_block = _ASSEMBLE_ROW_BLOCK
    blocks = []
    for r0 in range(0, n, row_block):
        r1 = min(r0 + row_block, n)
        coo = native.assemble_h_coo(terms, basis, r0, r1)
        if coo is None:
            coo = _assemble_rows_np(terms, basis, r0, r1)
        rows, cols, vals = coo
        blocks.append(sp.csr_matrix(
            (vals, (rows - r0, cols)), shape=(r1 - r0, n)))
    return blocks


def assemble_sparse_hamiltonian_np(terms: PauliTerms, basis: np.ndarray,
                                   row_block: int = None):
    """scipy CSR H over a sorted packed-state basis (for Lanczos solve_H).

    Uses the native C++/OpenMP assembler (csrc/naqs_host.cpp) when available,
    else pure numpy. Bases larger than `row_block` rows assemble block-by-
    block (COO staging memory stays O(row_block), only the final CSR is
    O(nnz)) — required for million-state spaces (H2O 6-31G full basis).
    For spaces whose MATRIX does not comfortably fit either, use
    hamiltonian_linear_operator instead.
    """
    import scipy.sparse as sp

    blocks = assemble_sparse_hamiltonian_blocks(terms, basis, row_block)
    if len(blocks) == 1:
        return blocks[0]
    return sp.vstack(blocks, format="csr")


def hamiltonian_linear_operator(terms: PauliTerms, basis: np.ndarray,
                                row_block: int = None):
    """H as a scipy LinearOperator over int32-indexed CSR row-blocks —
    eigsh-ready for spaces where one monolithic CSR would not fit (the
    vstack alone doubles the footprint; the H2O 6-31G full sector is
    ~3.7e9 nnz, > int32, so a single matrix costs 16 B/nnz + a copy)."""
    from scipy.sparse.linalg import LinearOperator

    basis = np.asarray(basis, dtype=np.uint64)
    blocks = assemble_sparse_hamiltonian_blocks(terms, basis, row_block)
    n = len(basis)

    def mv(x):
        x = np.asarray(x)
        if x.ndim == 2:  # eigsh probes with column vectors
            x = x[:, 0]
        return np.concatenate([b @ x for b in blocks])

    return LinearOperator((n, n), matvec=mv, dtype=np.float64)


def local_energy_np(
    terms: PauliTerms, states: np.ndarray, psi: np.ndarray
) -> np.ndarray:
    """Host-oracle local energy E_loc(s) = sum_s' H_{s s'} psi(s') / psi(s).

    `states` must be sorted ascending; psi aligned. States outside the sample
    contribute zero (reference semantics, energy.py:247-248). This is also the
    CPU performance baseline quoted by bench.py.
    """
    states = np.asarray(states, dtype=np.uint64)
    e = diagonal_energy_np(terms, states).astype(np.complex128)
    for xy in terms.xy_unique:
        sel = terms.xy == xy
        yzs, cs = terms.yz[sel], terms.coeff[sel]
        coupled = states ^ xy
        pos = np.searchsorted(states, coupled)
        pos_c = np.minimum(pos, len(states) - 1)
        found = states[pos_c] == coupled
        h = np.zeros(len(states), dtype=np.float64)
        for yz, c in zip(yzs, cs):
            h += c * np_parity_pm1(states & yz)
        # guard psi == 0 rows: their ratio is defined as 0 (the reference's
        # unsampled-amplitude semantics), and an unguarded divide emits
        # warnings / inf in the host oracle
        denom = np.where(psi == 0, 1.0, psi)
        ratio = np.where(found & (psi != 0), psi[pos_c] / denom, 0.0)
        e += h * ratio
    return e


# re-export the offline JW pipeline at the location molecule.py expects
from naqs_tpu.jw import jordan_wigner_from_integrals  # noqa: E402,F401


def freeze_core(terms: PauliTerms, n_occ: int) -> PauliTerms:
    """Project the Hamiltonian onto the subspace where the first `n_occ`
    qubits are frozen occupied (the reference's N_occ frozen-core padding,
    hilbert.py:331-342 / hamiltonian.py:394-396), and renumber the remaining
    qubits to start at 0.

    Terms flipping a frozen qubit are dropped; Z-factors on frozen qubits
    contribute a fixed (-1)^{popcount} sign folded into the coefficient.
    """
    if n_occ == 0:
        return terms
    frozen = np.uint64((1 << n_occ) - 1)
    shift = np.uint64(n_occ)

    def fold(xy, yz, coeff):
        keep = (xy & frozen) == 0
        xy, yz, coeff = xy[keep], yz[keep], coeff[keep]
        sign = np_parity_pm1(yz & frozen).astype(np.float64)
        return xy >> shift, yz >> shift, coeff * sign

    dxy, dyz, dco = fold(np.zeros_like(terms.diag_yz), terms.diag_yz, terms.diag_coeff)
    xy, yz, coeff = fold(terms.xy, terms.yz, terms.coeff)

    # re-merge duplicates through the standard compiler path
    out: dict = {}
    for m_xy, m_yz, c in zip(
        np.concatenate([np.zeros_like(dyz), xy]),
        np.concatenate([dyz, yz]),
        np.concatenate([dco, coeff]),
    ):
        ops = []
        q = 0
        bits = int(m_xy) | int(m_yz)
        while bits:
            if bits & 1:
                in_xy = (int(m_xy) >> q) & 1
                in_yz = (int(m_yz) >> q) & 1
                ops.append((q, "Y" if in_xy and in_yz else "X" if in_xy else "Z"))
            bits >>= 1
            q += 1
        key = tuple(ops)
        # undo the i^nY folding so compile_pauli_terms can redo it
        n_y = sum(1 for _, p in ops if p == "Y")
        out[key] = out.get(key, 0.0) + complex(c) / (1j**n_y).real
    return compile_pauli_terms(out, terms.n_qubits - n_occ)
