"""Recompute the exact-mode 'VMC+FCI' (full-training-basis ground state)
for summaries produced before cli.py passed the full basis to solve_h.
The value depends only on (H, basis) — identical to what the fixed CLI
now writes — so patching the stale counter-based numbers is a pure
recomputation, not a result change. n2_0.9/1.2 take the already-verified
sector ground states from data/n2_exact.json; h4o2_x4 recomputes its
n_exc<=4 eigsh here.
"""
import sys; sys.path.insert(0, "/root/repo")
import os, json, time
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import naqs_tpu as nq
from naqs_tpu.hamiltonian import assemble_sparse_hamiltonian_np
from scipy.sparse.linalg import eigsh


def patch(job, e0, n_basis):
    p = f"/root/repo/data/fleet/{job}/summary.json"
    j = json.load(open(p))
    j["e_vmc_fci_subspace"] = float(e0)
    j["n_unique_final"] = int(n_basis)
    j["vmc_fci_below_hf"] = bool(e0 < j["hf_energy"])
    j["vmc_fci_below_ccsd"] = bool(j["ccsd_energy"] is None or e0 < j["ccsd_energy"])
    j["vmc_fci_chem_acc"] = bool(e0 - j["fci_energy"] < 1.6e-3)
    json.dump(j, open(p, "w"), indent=1)
    print(f"{job}: e_vmc_fci={e0:.9f} (n={n_basis}) "
          f"d={1e3*(e0-j['fci_energy']):+.3f} mHa", flush=True)


ex = json.load(open("/root/repo/data/n2_exact.json"))
patch("n2_0.9", ex["0.9"]["e0_singlet"], 14400)
patch("n2_1.2", ex["1.2"]["e0_singlet"], 14400)

mol = nq.load_molecule("H4O2")
h0 = nq.Hilbert.for_molecule(mol)
h = nq.Hilbert(n_qubits=mol.n_qubits, sectors=h0.sectors, n_exc_max=4)
basis = np.sort(np.asarray(h.basis, dtype=np.uint64))
terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
t0 = time.time()
H = assemble_sparse_hamiltonian_np(terms, basis)
e0 = float(eigsh(H, k=1, which="SA")[0][0])
print(f"h4o2 eigsh {time.time()-t0:.0f}s", flush=True)
patch("h4o2_x4", e0, len(basis))
