import sys; sys.path.insert(0, "/root/repo")
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import naqs_tpu as nq
from naqs_tpu.hamiltonian import assemble_sparse_hamiltonian_np
from scipy.sparse.linalg import eigsh

mol = nq.load_molecule("carleo/LiH")
terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
h = nq.Hilbert.for_molecule(mol)
print("sectors:", h.sectors if hasattr(h, "sectors") else "?", "n_basis", len(h.basis))
basis = np.sort(np.asarray(h.basis, dtype=np.uint64))
print("contains state 15:", 15 in basis.tolist())
H = assemble_sparse_hamiltonian_np(terms, basis)
w = eigsh(H, k=2, which="SA")[0]
print("restricted eigs:", w, "target fci:", mol.fci_energy)
