"""Exact sector ground states + spin labels for the 11 N2 curve points.

Writes data/n2_exact.json: for each r, the lowest sector eigenvalues with
<S^2>, the lowest-singlet energy, and the stored Psi4 fci_energy. At deep
stretch the stored FCI root-flips (see utils/spin.py docstring)."""
import sys; sys.path.insert(0, "/root/repo")
import os, json
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import naqs_tpu as nq
from naqs_tpu.hamiltonian import assemble_sparse_hamiltonian_np
from naqs_tpu.utils.spin import lowest_eig_with_spin

out = {}
for r in ["0.75","0.9","1.05","1.2","1.35","1.5","1.65","1.8","1.95","2.1","2.25"]:
    mol = nq.load_molecule(f"N2_{r}")
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    h = nq.Hilbert.for_molecule(mol)
    basis = np.sort(np.asarray(h.basis, dtype=np.uint64))
    H = assemble_sparse_hamiltonian_np(terms, basis)
    e, v, s2, i = lowest_eig_with_spin(H, basis, mol.n_qubits, 0.0, k=6)
    from scipy.sparse.linalg import eigsh
    w = eigsh(H, k=6, which="SA")[0]
    out[r] = {
        "e0_sector": float(np.min(w)),
        "e0_singlet": float(e),
        "singlet_index": int(i) if i is not None else None,
        "eigs": [float(x) for x in np.sort(w)],
        "s2": [float(x) for x in s2],
        "stored_fci": float(mol.fci_energy),
        "root_flip": bool(abs(e - mol.fci_energy) > 1e-6),
    }
    print(r, out[r]["e0_singlet"], "stored", out[r]["stored_fci"],
          "flip" if out[r]["root_flip"] else "ok", flush=True)
json.dump(out, open("/root/repo/data/n2_exact.json", "w"), indent=1)
print("written")
