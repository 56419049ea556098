"""Airtight check of the r=2.1/2.25 root-flip claim: dense eigh over the
full 14,400-state sector (no iterative solver to misconverge)."""
import sys; sys.path.insert(0, "/root/repo")
import os, json
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import naqs_tpu as nq
from naqs_tpu.hamiltonian import assemble_sparse_hamiltonian_np

out = {}
for r in ("2.1", "2.25"):
    mol = nq.load_molecule(f"N2_{r}")
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    h = nq.Hilbert.for_molecule(mol)
    basis = np.sort(np.asarray(h.basis, dtype=np.uint64))
    H = assemble_sparse_hamiltonian_np(terms, basis).toarray()
    w = np.linalg.eigvalsh(H)
    out[r] = [float(x) for x in w[:6]]
    print(r, "dense lowest-6:", np.round(w[:6], 6), "stored:", mol.fci_energy, flush=True)
json.dump(out, open("/root/repo/data/n2_dense_check.json", "w"), indent=1)
