import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import naqs_tpu as nq
from naqs_tpu.hamiltonian import assemble_sparse_hamiltonian_np
from scipy.sparse.linalg import eigsh

mol = nq.load_molecule("Li2O")
terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
print(f"FCI={mol.fci_energy:.6f} CCSD={mol.ccsd_energy:.6f}", flush=True)
h0 = nq.Hilbert.for_molecule(mol)
for nexc in (3, 4):
    h = nq.Hilbert(n_qubits=mol.n_qubits, sectors=h0.sectors, n_exc_max=nexc)
    basis = np.sort(np.asarray(h.basis, dtype=np.uint64))
    print(f"n_exc<={nexc}: {len(basis)} states", flush=True)
    if len(basis) > 1_200_000:
        print("  too big for host assembly here; stopping", flush=True)
        break
    t0 = time.time()
    H = assemble_sparse_hamiltonian_np(terms, basis)
    t1 = time.time()
    w = eigsh(H, k=1, which="SA")[0][0]
    print(f"  E0={w:.6f}  err={1e3*(w-mol.fci_energy):+.3f} mHa  "
          f"(assemble {t1-t0:.0f}s, eigsh {time.time()-t1:.0f}s, nnz={H.nnz})", flush=True)
    if w - mol.fci_energy < 1.0e-3:
        print("  -> floor OK", flush=True)
        break
