"""Compare retarget losses: e_after vs epochs, on LiH full-mask."""
import sys, os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import naqs_tpu as nq
from naqs_tpu.models.nade import NAQSConfig
from naqs_tpu.trainer import TrainConfig, VMCTrainer

mol = nq.load_molecule("LiH")
h = nq.Hilbert.for_molecule(mol)
terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
cfg = NAQSConfig(n_qubits=mol.n_qubits, sectors=h.sectors,
                 amp_hidden=(16,), phase_hidden=(32,), masking="full")
tc = TrainConfig(n_train=200, n_samples=1e6, n_unq_samples_min=64,
                 n_unq_samples_max=256, use_lr_schedule=False, lr=1e-3, seed=6)

import copy, jax as _jax
tr = VMCTrainer(cfg, terms, h, tc)
tr.pre_flatten(30)
tr.run(150, output_freq=1000)
p0 = _jax.tree.map(lambda x: x.copy(), tr.params)
e_before = tr.exact_energy()
print("e_before", e_before, "fci", mol.fci_energy)

for loss in ["mse", "wmse", "overlap"]:
    for ep in [500, 1500]:
        tr.params = _jax.tree.map(lambda x: x.copy(), p0)
        e0, _ = tr.warm_start_from_solve_h(states=h.basis, n_epochs=ep, loss=loss)
        print(f"loss={loss} ep={ep}: e_after={tr.exact_energy():.6f} (e0={e0:.6f})", flush=True)
