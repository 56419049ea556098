import sys; sys.path.insert(0, "/root/repo")
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import naqs_tpu as nq
from naqs_tpu.hamiltonian import assemble_sparse_hamiltonian_np
from naqs_tpu.utils.spin import lowest_eig_with_spin

# sanity: LiH ground state is a singlet
mol = nq.load_molecule("LiH")
terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
h = nq.Hilbert.for_molecule(mol)
basis = np.sort(np.asarray(h.basis, dtype=np.uint64))
H = assemble_sparse_hamiltonian_np(terms, basis)
e, v, s2, i = lowest_eig_with_spin(H, basis, mol.n_qubits, 0.0, k=6)
print(f"LiH: e={e:.6f} fci={mol.fci_energy:.6f} s2_list={np.round(s2,3)} idx={i}")

for r in ("2.1", "2.25"):
    mol = nq.load_molecule(f"N2_{r}")
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    h = nq.Hilbert.for_molecule(mol)
    basis = np.sort(np.asarray(h.basis, dtype=np.uint64))
    H = assemble_sparse_hamiltonian_np(terms, basis)
    e, v, s2, i = lowest_eig_with_spin(H, basis, mol.n_qubits, 0.0, k=8)
    print(f"N2_{r}: lowest singlet e={e:.6f} stored_fci={mol.fci_energy:.6f} "
          f"d={1e3*(e-mol.fci_energy):+.3f} mHa  s2={np.round(s2,3)} idx={i}", flush=True)
