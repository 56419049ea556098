import sys; sys.path.insert(0, "/root/repo")
"""CISDTQ floor for H2O 6-31G: is the n_exc_max-restricted space's exact
ground state within chemical accuracy of FCI? If yes, exact-sampling-mode
training over that space sidesteps the sampling trap entirely."""
import os, time
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import naqs_tpu as nq
from naqs_tpu.hamiltonian import assemble_sparse_hamiltonian_np
from scipy.sparse.linalg import eigsh

mol = nq.load_molecule("H2O_6-31G")
terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
print(f"FCI={mol.fci_energy:.6f} CCSD={mol.ccsd_energy:.6f}", flush=True)
for nexc in (3, 4, 5):
    h0 = nq.Hilbert.for_molecule(mol)
    h = nq.Hilbert(n_qubits=mol.n_qubits, sectors=h0.sectors, n_exc_max=nexc)
    basis = h.basis
    print(f"n_exc<={nexc}: {len(basis)} states", flush=True)
    t0 = time.time()
    H = assemble_sparse_hamiltonian_np(terms, np.sort(basis))
    t1 = time.time()
    w = eigsh(H, k=1, which="SA")[0][0]
    print(f"  E0={w:.6f}  err={1e3*(w-mol.fci_energy):+.3f} mHa  "
          f"(assemble {t1-t0:.0f}s, eigsh {time.time()-t1:.0f}s, "
          f"nnz={H.nnz})", flush=True)
    if w - mol.fci_energy < 1.0e-3:
        print("  -> floor OK at this n_exc", flush=True)
        break
