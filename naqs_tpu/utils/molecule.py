"""Molecule I/O: OpenFermion-format HDF5 + pickled qubit-Hamiltonian loader.

Standalone replacements for the reference's OpenFermion dependency
(reference: src/utils/system.py:14-62 loads MolecularData hdf5 and a pickled
jordan_wigner QubitOperator). We read the hdf5 directly with h5py and
unpickle the QubitOperator with a shim class, so no openfermion install is
needed. The qubit Hamiltonian can also be rebuilt from the stored molecular
integrals via our own Jordan-Wigner pipeline (naqs_tpu.hamiltonian.jordan_wigner).
"""

from __future__ import annotations

import io
import os
import pickle
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import numpy as np

# Directories searched (in order) for `<name>/<name>.hdf5` molecule folders.
_DEFAULT_SEARCH_PATH = [
    os.environ.get("NAQS_TPU_MOLECULE_DIR", ""),
    "molecules",
    os.path.join(os.path.dirname(__file__), "..", "..", "molecules"),
    "/root/reference/molecules",
]

PauliTermDict = Dict[Tuple[Tuple[int, str], ...], complex]


@dataclass
class Molecule:
    """Molecular data needed for a VMC run (subset of OpenFermion MolecularData)."""

    name: str = ""
    basis: str = ""
    n_qubits: int = 0
    n_orbitals: int = 0
    n_electrons: int = 0
    multiplicity: int = 1
    nuclear_repulsion: float = 0.0
    hf_energy: Optional[float] = None
    mp2_energy: Optional[float] = None
    cisd_energy: Optional[float] = None
    ccsd_energy: Optional[float] = None
    fci_energy: Optional[float] = None
    one_body_integrals: Optional[np.ndarray] = None
    two_body_integrals: Optional[np.ndarray] = None
    orbital_energies: Optional[np.ndarray] = None
    qubit_hamiltonian: Optional[PauliTermDict] = field(default=None, repr=False)

    @property
    def n_alpha_electrons(self) -> int:
        # multiplicity = 2S + 1 and n_alpha - n_beta = 2S
        return (self.n_electrons + self.multiplicity - 1) // 2

    @property
    def n_beta_electrons(self) -> int:
        return (self.n_electrons - self.multiplicity + 1) // 2


class _QubitOperatorShim:
    """Stand-in for openfermion QubitOperator during unpickling.

    Only the `.terms` dict (pauli-string tuple -> coefficient) is used.
    """

    terms: PauliTermDict


# The qubit-Hamiltonian pickles come from an untrusted data directory; only a
# fixed allowlist of classes may be reconstructed (a generic Unpickler would
# execute arbitrary __reduce__ gadgets).
_SAFE_CLASSES = {
    ("builtins", "complex"): complex,
    ("builtins", "float"): float,
    ("builtins", "int"): int,
    ("builtins", "dict"): dict,
    ("builtins", "tuple"): tuple,
    ("builtins", "list"): list,
    ("builtins", "str"): str,
    ("builtins", "frozenset"): frozenset,
    ("builtins", "set"): set,
}
_SAFE_NUMPY = {
    "ndarray", "dtype", "_reconstruct", "scalar", "float64", "complex128",
    "int64",
}


class _ShimUnpickler(pickle.Unpickler):
    def find_class(self, module, name):  # noqa: D102
        if name == "QubitOperator" and module.startswith("openfermion"):
            return _QubitOperatorShim
        if (module, name) in _SAFE_CLASSES:
            return _SAFE_CLASSES[(module, name)]
        if module.startswith("numpy") and name in _SAFE_NUMPY:
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"refusing to unpickle {module}.{name} from untrusted molecule data"
        )


def load_qubit_hamiltonian_pickle(path: str) -> PauliTermDict:
    """Load a pickled (open-fermion format) qubit operator's term dict."""
    with open(path, "rb") as f:
        op = _ShimUnpickler(io.BytesIO(f.read())).load()
    terms = {k: complex(v) for k, v in op.terms.items()}
    return terms


def _read_scalar(f, key, cast):
    if key not in f:
        return None
    val = f[key][()]
    if isinstance(val, (bool, np.bool_)):  # OpenFermion writes `False` for absent
        return None
    try:
        return cast(val)
    except (TypeError, ValueError):
        return None


def _resolve_molecule_dir(name_or_path: str) -> str:
    if os.path.isdir(name_or_path):
        return name_or_path
    rel = os.path.normpath(name_or_path)
    base = os.path.basename(rel)
    for cand_name in (rel, base) if rel != base else (base,):
        for root in _DEFAULT_SEARCH_PATH:
            if not root:
                continue
            cand = os.path.join(root, cand_name)
            if os.path.isdir(cand):
                return cand
    raise FileNotFoundError(
        f"Molecule folder '{name_or_path}' not found (searched {_DEFAULT_SEARCH_PATH})."
    )


def load_molecule(name_or_path: str, load_hamiltonian: bool = True,
                  hamiltonian_fname: str | None = None) -> Molecule:
    """Load `<dir>/<mol>.hdf5` (+ `<mol>_qubit_hamiltonian.pkl` if present).

    `name_or_path` may be a molecule folder path or a bare molecule name
    resolved against NAQS_TPU_MOLECULE_DIR / ./molecules.
    `hamiltonian_fname` overrides the qubit-hamiltonian pickle location
    (reference -hf/--hamiltonian_fname, _base.py:446, system.py:14-26).
    """
    import h5py

    mol_dir = _resolve_molecule_dir(name_or_path)
    mol_name = os.path.basename(os.path.normpath(mol_dir))
    h5_path = os.path.join(mol_dir, f"{mol_name}.hdf5")
    if not os.path.exists(h5_path):
        # fall back to any .hdf5 in the folder
        cands = [p for p in os.listdir(mol_dir) if p.endswith(".hdf5")]
        if not cands:
            raise FileNotFoundError(f"No .hdf5 found in {mol_dir}")
        h5_path = os.path.join(mol_dir, cands[0])

    with h5py.File(h5_path, "r") as f:
        def arr(key):
            if key not in f:
                return None
            val = f[key][()]
            if isinstance(val, (bool, np.bool_)):
                return None
            return np.asarray(val, dtype=np.float64)

        mol = Molecule(
            name=str(f["name"][()].decode() if "name" in f else mol_name),
            basis=str(f["basis"][()].decode() if "basis" in f else ""),
            n_qubits=int(f["n_qubits"][()]),
            n_orbitals=int(f["n_orbitals"][()]),
            n_electrons=int(f["n_electrons"][()]),
            multiplicity=int(f["multiplicity"][()]),
            nuclear_repulsion=float(f["nuclear_repulsion"][()]),
            hf_energy=_read_scalar(f, "hf_energy", float),
            mp2_energy=_read_scalar(f, "mp2_energy", float),
            cisd_energy=_read_scalar(f, "cisd_energy", float),
            ccsd_energy=_read_scalar(f, "ccsd_energy", float),
            fci_energy=_read_scalar(f, "fci_energy", float),
            one_body_integrals=arr("one_body_integrals"),
            two_body_integrals=arr("two_body_integrals"),
            orbital_energies=arr("orbital_energies"),
        )

    if load_hamiltonian:
        pkl_path = hamiltonian_fname or os.path.join(
            mol_dir, f"{mol_name}_qubit_hamiltonian.pkl")
        if os.path.exists(pkl_path):
            mol.qubit_hamiltonian = load_qubit_hamiltonian_pickle(pkl_path)
        elif mol.one_body_integrals is not None:
            from naqs_tpu.hamiltonian import jordan_wigner_from_integrals

            mol.qubit_hamiltonian = jordan_wigner_from_integrals(
                mol.one_body_integrals, mol.two_body_integrals, mol.nuclear_repulsion
            )
    return mol
