import sys; sys.path.insert(0, "/root/repo")
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import naqs_tpu as nq
from naqs_tpu.hamiltonian import PauliTerms, assemble_sparse_hamiltonian_np
from scipy.sparse.linalg import eigsh

mol = nq.load_molecule("carleo/LiH")
h = nq.Hilbert.for_molecule(mol)
basis = np.sort(np.asarray(h.basis, dtype=np.uint64))
with np.load("data/terms_cache/LiH_terms.npz") as z:
    terms = PauliTerms(**{k: z[k] for k in z.files if k != "n_qubits"}, n_qubits=int(z["n_qubits"]))
H = assemble_sparse_hamiltonian_np(terms, basis)
w = eigsh(H, k=1, which="SA")[0]
print("cached-LiH H over carleo basis eig:", w, " job reported:", -7.784460280267044)
