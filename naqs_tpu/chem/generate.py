"""Molecule-data generation CLI: geometry -> trainable molecule folder.

Replaces the reference's offline data pipeline (notebooks/
generate_molecular_data_and_baselines.ipynb: Psi4 SCF/FCI + OpenFermion
MolecularData + jordan_wigner pickle) with the from-scratch chain

    chem.basis (STO-3G refit) -> chem.integrals (McMurchie-Davidson)
    -> chem.scf (DIIS RHF, or Guest-Saunders ROHF for multiplicity > 1,
       + MO transform + MP2)
    -> chem.cc (spin-orbital CCSD baseline, closed and open shell)
    -> hdf5 in the stored-data layout (utils/molecule.py reads it back)
    -> CISD + FCI baselines via exact sector diagonalization of OUR
       Jordan-Wigner Hamiltonian (naqs_tpu.jw), when the sector is
       enumerable (CISD = the n_exc<=2 restricted sector).

    Every baseline validates against the stored Psi4 values to <2e-7 Ha
    on the shipped molecules, including triplet O2/CH2 (tests/test_chem.py,
    tests/test_cc.py).

No qubit-Hamiltonian pickle is written: load_molecule() rebuilds the
operator from the stored integrals through naqs_tpu.jw, which is
machine-precision equivalent to the shipped OpenFermion pickles
(tests/test_jw.py).

Usage:
    python -m naqs_tpu.chem.generate --atoms H H --positions 0 0 0 0 0 0.7414 \
        --out molecules/MyH2
    python -m naqs_tpu.chem.generate --xyz water.xyz --out molecules/MyH2O
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional, Sequence

import numpy as np


def generate_molecule_data(
    symbols: Sequence[str],
    positions_angstrom: np.ndarray,
    charge: int = 0,
    multiplicity: int = 1,
    name: Optional[str] = None,
    do_fci: bool = True,
    fci_max_states: int = 2_000_000,
    basis_name: str = "sto-3g",
) -> dict:
    """Run the full pipeline; returns the field dict written to hdf5."""
    from naqs_tpu.chem.scf import rhf, rohf

    positions_angstrom = np.asarray(positions_angstrom, dtype=np.float64)
    if multiplicity == 1:
        r = rhf(symbols, positions_angstrom, charge=charge,
                basis_name=basis_name)
    else:
        # open shell (O2/CH2 in the reference zoo): Guest-Saunders ROHF —
        # one spatial-orbital set, so the JW mapping below is unchanged
        r = rohf(symbols, positions_angstrom, charge=charge,
                 multiplicity=multiplicity, basis_name=basis_name)
    n_orbitals = r.one_body_mo.shape[0]
    n_qubits = 2 * n_orbitals
    out = {
        "name": name or "".join(symbols),
        "basis": basis_name,
        "n_qubits": n_qubits,
        "n_orbitals": n_orbitals,
        "n_electrons": r.n_electrons,
        "multiplicity": multiplicity,
        "nuclear_repulsion": r.e_nuc,
        "hf_energy": r.e_hf,
        # ROHF MP2 is not uniquely defined; omitted for open shell
        "mp2_energy": r.e_mp2 if multiplicity == 1 else None,
        "orbital_energies": r.orbital_energies,
        "one_body_integrals": r.one_body_mo,
        "two_body_integrals": r.two_body_mo,
        "symbols": list(symbols),
        "positions": positions_angstrom,
    }

    # CCSD baseline (chem.cc): same solver family the reference's data
    # notebook records from Psi4; validates to ~1e-8 Ha on the shipped
    # molecules (tests/test_cc.py)
    from naqs_tpu.chem.cc import ccsd

    cc = ccsd(r)
    if cc.converged:
        out["ccsd_energy"] = cc.e_ccsd
    else:
        print("(CCSD did not converge; omitting ccsd_energy)")

    if do_fci:
        from math import comb

        if multiplicity == 1:
            n_a = n_b = r.n_electrons // 2
        else:
            n_a, n_b = r.n_alpha, r.n_beta  # max-m_s sector holds the
            # multiplet ground state (S >= m_s = (mult-1)/2)
        sector = comb(n_orbitals, n_a) * comb(n_orbitals, n_b)
        if sector <= fci_max_states:
            from scipy.sparse.linalg import eigsh

            import naqs_tpu as nq
            from naqs_tpu.hamiltonian import (
                assemble_sparse_hamiltonian_np, compile_pauli_terms,
                hamiltonian_linear_operator, jordan_wigner_from_integrals)

            td = jordan_wigner_from_integrals(
                r.one_body_mo, r.two_body_mo, r.e_nuc)
            terms = compile_pauli_terms(td, n_qubits)

            def _sector_e0(n_exc_max=None):
                hil = nq.Hilbert(n_qubits=n_qubits, sectors=((n_a, n_b),),
                                 n_exc_max=n_exc_max)
                basis = np.sort(np.asarray(hil.basis, dtype=np.uint64))
                if len(basis) > 400_000:
                    # block LinearOperator: a monolithic CSR for these
                    # spaces costs 16 B/nnz (int64 indices) plus a vstack
                    # copy — the H2O 6-31G full sector OOM-killed a 125 GB
                    # host that way
                    op = hamiltonian_linear_operator(terms, basis)
                    return float(eigsh(op, k=1, which="SA")[0][0])
                H = assemble_sparse_hamiltonian_np(terms, basis)
                if H.shape[0] < 3:
                    return float(np.linalg.eigvalsh(H.toarray())[0])
                return float(eigsh(H, k=1, which="SA")[0][0])

            # CISD = ground state of H restricted to HF+singles+doubles
            # (the reference stores Psi4's cisd_energy; same CI space for
            # closed shells — matches to 2e-8 Ha. For open shells Psi4
            # spin-completes the space, lowering it a few 1e-5 Ha.)
            out["cisd_energy"] = _sector_e0(n_exc_max=2)
            out["fci_energy"] = _sector_e0()
        else:
            print(f"(sector has {sector:.3g} states > {fci_max_states}; "
                  "skipping FCI baseline)")
    return out


def write_molecule_dir(data: dict, out_dir: str) -> str:
    """Write `<out_dir>/<basename>.hdf5` in the stored-data layout."""
    import h5py

    os.makedirs(out_dir, exist_ok=True)
    mol_name = os.path.basename(os.path.normpath(out_dir))
    path = os.path.join(out_dir, f"{mol_name}.hdf5")
    with h5py.File(path, "w") as f:
        f["name"] = np.bytes_(data["name"])
        f["basis"] = np.bytes_(data["basis"])
        for k in ("n_qubits", "n_orbitals", "n_electrons", "multiplicity"):
            f[k] = int(data[k])
        f["nuclear_repulsion"] = float(data["nuclear_repulsion"])
        for k in ("hf_energy", "mp2_energy", "cisd_energy", "ccsd_energy",
                  "fci_energy"):
            if data.get(k) is not None:
                f[k] = float(data[k])
        for k in ("orbital_energies", "one_body_integrals",
                  "two_body_integrals"):
            f[k] = np.asarray(data[k], dtype=np.float64)
        f["geometry/atoms"] = np.array(
            [s.encode() for s in data["symbols"]])
        f["geometry/positions"] = np.asarray(data["positions"],
                                             dtype=np.float64)
    return path


def _read_xyz(path: str):
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    try:
        n = int(lines[0])
        body = lines[2:2 + n]  # standard xyz: count, comment, atoms
    except ValueError:
        body = lines  # bare "<sym> x y z" lines
    symbols: List[str] = []
    pos = []
    for ln in body:
        parts = ln.split()
        symbols.append(parts[0])
        pos.append([float(x) for x in parts[1:4]])
    return symbols, np.asarray(pos)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Generate a trainable molecule folder from a geometry "
                    "(replaces the reference's Psi4 notebook pipeline).")
    p.add_argument("--atoms", nargs="+", help="element symbols")
    p.add_argument("--positions", nargs="+", type=float,
                   help="flat x y z per atom, in Angstrom")
    p.add_argument("--xyz", help="read geometry from an .xyz file instead")
    p.add_argument("--charge", type=int, default=0)
    p.add_argument("--multiplicity", type=int, default=1,
                   help="2S+1; >1 selects the ROHF open-shell path")
    p.add_argument("--name", default=None)
    p.add_argument("--basis", default="sto-3g",
                   help="sto-3g (reconstructed), or an explicitly-tabulated "
                        "set: 6-31g, cc-pvdz, cc-pvtz (chem/basis.py "
                        "EXPLICIT_BASES)")
    p.add_argument("--out", required=True, help="output molecule folder")
    p.add_argument("--no-fci", action="store_true",
                   help="skip the exact-diagonalization FCI baseline")
    p.add_argument("--fci-max-states", type=int, default=2_000_000)
    args = p.parse_args(argv)

    if args.xyz:
        symbols, pos = _read_xyz(args.xyz)
    else:
        if not args.atoms or not args.positions:
            p.error("provide --xyz or both --atoms and --positions")
        if len(args.positions) != 3 * len(args.atoms):
            p.error("--positions must supply x y z per atom")
        symbols = args.atoms
        pos = np.asarray(args.positions, dtype=np.float64).reshape(-1, 3)

    data = generate_molecule_data(
        symbols, pos, charge=args.charge, multiplicity=args.multiplicity,
        name=args.name, basis_name=args.basis,
        do_fci=not args.no_fci, fci_max_states=args.fci_max_states)
    path = write_molecule_dir(data, args.out)
    print(f"wrote {path}")
    print(f"  HF  = {data['hf_energy']:.6f} Ha")
    if data.get("mp2_energy") is not None:
        print(f"  MP2 = {data['mp2_energy']:.6f} Ha")
    if data.get("ccsd_energy") is not None:
        print(f"  CCSD= {data['ccsd_energy']:.6f} Ha")
    if data.get("fci_energy") is not None:
        print(f"  FCI = {data['fci_energy']:.6f} Ha")
    return path


if __name__ == "__main__":
    main()
