import os
import sys; sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import naqs_tpu as nq
from naqs_tpu.hamiltonian import assemble_sparse_hamiltonian_np
from scipy.sparse.linalg import eigsh

mol = nq.load_molecule("carleo/LiH")
print("n_qubits", mol.n_qubits, "n_elec", mol.n_electrons, "mult", getattr(mol, "multiplicity", None))
print("hf", mol.hf_energy, "fci", mol.fci_energy)
terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
basis = np.arange(1 << mol.n_qubits, dtype=np.uint64)
H = assemble_sparse_hamiltonian_np(terms, basis)
w, v = eigsh(H, k=3, which="SA")
print("full-space lowest eigs:", w)
g = np.abs(v[:, 0])
top = np.argsort(-g)[:5]
for t in top:
    bits = [(int(t) >> k) & 1 for k in range(mol.n_qubits)]
    n_up = sum(bits[0::2]); n_dn = sum(bits[1::2])
    print(f"  state {t:4d} amp={g[t]:.4f} n_up={n_up} n_dn={n_dn} popcount={sum(bits)}")
