"""Hilbert-space bookkeeping over packed uint64 occupation bitstrings.

Replaces the reference's full/restricted/partially-restricted Hilbert classes
(reference: src/utils/hilbert.py:28-900). Instead of int8 state tensors and
dense 2^N index LUTs, states ARE their packed integers: the restricted basis
is a sorted uint64 array, state->index is a binary search, index->state is a
gather. The "partially restricted" (multi-sector, open-shell) case is a
concatenation of sector bases, deduplicated and re-sorted.

Qubit convention (Jordan-Wigner, OpenFermion order): bit 2i = alpha spin of
spatial orbital i, bit 2i+1 = beta spin. A "shell" is a spatial orbital
(pair of qubits).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass
from functools import cached_property
from math import comb
from typing import Optional, Tuple

import numpy as np


def _spin_combos(n_slots: int, n_occ: int, stride_weights: np.ndarray) -> np.ndarray:
    """All C(n_slots, n_occ) packed ints with n_occ bits set at the given weights."""
    if n_occ < 0 or n_occ > n_slots:
        return np.zeros((0,), dtype=np.uint64)
    from naqs_tpu import native

    fast = native.enumerate_combinations(n_slots, n_occ, stride_weights)
    if fast is not None:
        return fast
    out = np.fromiter(
        (
            np.uint64(sum(int(stride_weights[p]) for p in pos))
            for pos in itertools.combinations(range(n_slots), n_occ)
        ),
        dtype=np.uint64,
        count=comb(n_slots, n_occ),
    )
    return out


@dataclass(frozen=True)
class Hilbert:
    """Electron-number-restricted Hilbert space for N qubits (N even, <= 64).

    sectors: allowed (n_alpha, n_beta) electron-count pairs. One pair for
    closed-shell / fixed-m_s runs; several for open-shell runs where only
    total S_z is constrained (reference: experiments/_base.py:126-136).
    """

    n_qubits: int
    sectors: Tuple[Tuple[int, int], ...]
    # max electrons above the lowest n_electrons spin-orbitals (reference
    # N_exc_max subspace, hilbert.py:269-271); None = no excitation cap
    n_exc_max: Optional[int] = None

    def __post_init__(self):
        if self.n_qubits % 2 != 0 or not (2 <= self.n_qubits <= 64):
            raise ValueError(f"n_qubits must be even in [2, 64], got {self.n_qubits}")
        if not self.sectors:
            raise ValueError("at least one (n_alpha, n_beta) sector required")
        s = self.n_shells
        for (na, nb) in self.sectors:
            if not (0 <= na <= s and 0 <= nb <= s):
                raise ValueError(f"sector ({na},{nb}) out of range for {s} shells")
        if self.n_exc_max is not None:
            ns = {na + nb for (na, nb) in self.sectors}
            if len(ns) != 1:
                raise ValueError(
                    "n_exc_max requires all sectors to share one total "
                    f"electron count, got {ns}"
                )

    @staticmethod
    def for_molecule(mol, restrict_to_ms: bool = True) -> "Hilbert":
        """Sector logic of the reference driver (experiments/_base.py:109-136)."""
        na, nb = mol.n_alpha_electrons, mol.n_beta_electrons
        m_s = abs(na - nb) // 2
        if m_s == 0 or restrict_to_ms:
            sectors = ((na, nb),)
        else:
            n = na + nb
            nas = n // 2 + np.arange(-m_s, m_s + 1)
            nbs = n // 2 + np.arange(m_s, -m_s - 1, -1)
            sectors = tuple((int(a), int(b)) for a, b in zip(nas, nbs))
        return Hilbert(n_qubits=mol.n_qubits, sectors=sectors)

    @staticmethod
    def full_n_up(n_qubits: int, n_electrons: int,
                  n_exc_max: Optional[int] = None) -> "Hilbert":
        """All spin splits of a fixed TOTAL electron count — the reference's
        full-space N_up subspace used when the per-spin restriction is off
        (-no_restrictedH; reference _HilbertFull.get_subspace N_up path,
        hilbert.py:236-271 + energy.py:93-97)."""
        s = n_qubits // 2
        sectors = tuple(
            (na, n_electrons - na)
            for na in range(max(0, n_electrons - s), min(s, n_electrons) + 1)
        )
        return Hilbert(n_qubits=n_qubits, sectors=sectors, n_exc_max=n_exc_max)

    @property
    def n_shells(self) -> int:
        return self.n_qubits // 2

    @property
    def sector_size(self) -> int:
        """Size of the unfiltered sector product space (the rank/dense-table
        address space; >= len(basis) when n_exc_max filters states)."""
        s = self.n_shells
        sizes = {(na, nb): comb(s, na) * comb(s, nb) for (na, nb) in set(self.sectors)}
        return sum(sizes.values())

    @property
    def size(self) -> int:
        if self.n_exc_max is None:
            return self.sector_size
        return len(self.basis)

    def excitation_count(self, states: np.ndarray) -> np.ndarray:
        """Excitations from the (per-sector) HF reference determinant:
        alpha electrons outside the lowest-n_alpha alpha orbitals plus beta
        electrons outside the lowest-n_beta beta orbitals, measured against
        the state's own (n_alpha, n_beta). For closed shells this equals
        the old prefix count (electrons above bit 2*n_occ-1); for open
        shells the prefix version was WRONG — CH2's (5,3) reference
        occupies alpha bit 8, not beta bit 7 (caught by the CISD baseline
        validating 11 mHa off Psi4's)."""
        s = np.asarray(states, dtype=np.uint64)
        alpha_bits = np.uint64(0x5555555555555555)
        a = s & alpha_bits
        b = s & ~alpha_bits
        na = np.bitwise_count(a).astype(np.uint64)
        nb = np.bitwise_count(b).astype(np.uint64)
        full = np.uint64(0xFFFFFFFFFFFFFFFF)

        def prefix(n):  # lowest-n alpha-position bits: (4^n - 1) / 3
            wide = np.where(n >= 32, full,
                            (np.uint64(1) << (np.uint64(2) * n)) - np.uint64(1))
            return wide // np.uint64(3)

        exc_a = np.bitwise_count(a & ~prefix(na))
        exc_b = np.bitwise_count(b & ~(prefix(nb) << np.uint64(1)))
        return (exc_a + exc_b).astype(np.int64)

    @cached_property
    def basis(self) -> np.ndarray:
        """Sorted packed uint64 basis of all valid states (all sectors)."""
        s = self.n_shells
        alpha_w = np.uint64(1) << (2 * np.arange(s, dtype=np.uint64))
        beta_w = np.uint64(1) << (2 * np.arange(s, dtype=np.uint64) + np.uint64(1))
        parts = []
        for (na, nb) in set(self.sectors):
            a = _spin_combos(s, na, alpha_w)
            b = _spin_combos(s, nb, beta_w)
            parts.append((a[:, None] | b[None, :]).ravel())
        basis = np.unique(np.concatenate(parts))
        if self.n_exc_max is not None:
            basis = basis[self.excitation_count(basis) <= self.n_exc_max]
        return basis.astype(np.uint64)

    def state_to_index(self, states: np.ndarray) -> np.ndarray:
        """Restricted-basis index of packed states; -1 if not in the basis."""
        states = np.asarray(states, dtype=np.uint64)
        basis = self.basis
        pos = np.searchsorted(basis, states)
        pos_c = np.minimum(pos, len(basis) - 1)
        ok = basis[pos_c] == states
        return np.where(ok, pos_c, -1).astype(np.int64)

    def index_to_state(self, idx: np.ndarray) -> np.ndarray:
        return self.basis[np.asarray(idx, dtype=np.int64)]

    def contains(self, states: np.ndarray) -> np.ndarray:
        return self.state_to_index(states) >= 0

    def hf_state(self, sector: Optional[Tuple[int, int]] = None) -> np.uint64:
        """Packed Hartree-Fock reference state (lowest orbitals filled)."""
        na, nb = sector if sector is not None else self.sectors[0]
        x = 0
        for i in range(na):
            x |= 1 << (2 * i)
        for i in range(nb):
            x |= 1 << (2 * i + 1)
        return np.uint64(x)

    def sector_counts(self, states: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(n_alpha, n_beta) occupation counts per packed state."""
        states = np.asarray(states, dtype=np.uint64)
        alpha_mask = np.uint64(sum(1 << (2 * i) for i in range(self.n_shells)))
        beta_mask = np.uint64(sum(1 << (2 * i + 1) for i in range(self.n_shells)))
        na = np.bitwise_count(states & alpha_mask).astype(np.int64)
        nb = np.bitwise_count(states & beta_mask).astype(np.int64)
        return na, nb
