import sys; sys.path.insert(0, "/root/repo")
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import naqs_tpu as nq
from naqs_tpu.hamiltonian import assemble_sparse_hamiltonian_np
from scipy.sparse.linalg import eigsh

for r in ("1.8", "1.95", "2.1", "2.25"):
    mol = nq.load_molecule(f"N2_{r}")
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    h = nq.Hilbert.for_molecule(mol)
    basis = np.sort(np.asarray(h.basis, dtype=np.uint64))
    H = assemble_sparse_hamiltonian_np(terms, basis)
    w = eigsh(H, k=4, which="SA")[0]
    print(f"N2_{r}: sector size {len(basis)}  eigs {np.round(w,6)}  stored_fci {mol.fci_energy:.6f}  d0={1e3*(w[0]-mol.fci_energy):+.3f} mHa", flush=True)
