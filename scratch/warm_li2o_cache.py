"""Pre-warm the Li2O CISDTQ full-basis eigensolve disk cache (host-only)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["NAQS_TPU_DENSE"] = "0"   # no engine build needed for a host solve
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import naqs_tpu as nq
from naqs_tpu.models.nade import NAQSConfig
from naqs_tpu.trainer import TrainConfig, VMCTrainer

mol = nq.load_molecule("Li2O")
h = nq.Hilbert.for_molecule(mol, restrict_to_ms=True)
h = nq.Hilbert(n_qubits=h.n_qubits, sectors=h.sectors, n_exc_max=4)
terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits,
                               n_excitations_max=4)
s = mol.n_qubits // 2
cfg = NAQSConfig(n_qubits=mol.n_qubits, sectors=h.sectors, masking="full",
                 amp_hidden=(64,), phase_hidden=(512, 512),
                 shell_order=tuple(range(s - 1, -1, -1)))
tr = VMCTrainer(cfg, terms, h, TrainConfig(n_train=1, seed=11))
e0, n = tr.warm_start_from_solve_h(states=h.basis, n_epochs=1, lr=1e-6)
print("cached Li2O CISDTQ E0 =", e0, "over", n, "states",
      "(FCI", mol.fci_energy, ")")
