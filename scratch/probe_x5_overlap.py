"""Overlap-loss retarget probe on the (mid-training) x5 checkpoint.

The democratic-mse retarget lands ~70 mHa high and the count-weighted VMC
polish descends ~2 mHa/1000 steps from there. The overlap loss (full-set
log-infidelity, fixed this round) never regresses and landed LiH within
5 mHa of the target — measure what it does on the real 149,661-state
H2O 6-31G CISDTQ problem.

Usage: python scratch/probe_x5_overlap.py [RUN_DIR] [N_EPOCHS] [LR]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join("data", "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import naqs_tpu as nq
from naqs_tpu.models.nade import NAQSConfig
from naqs_tpu.trainer import TrainConfig, VMCTrainer

RUN = sys.argv[1] if len(sys.argv) > 1 else "data/fleet/h2o_631g_x5"
N_EP = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
LR = float(sys.argv[3]) if len(sys.argv) > 3 else 2e-3
args = json.load(open(os.path.join(RUN, "args.json")))
mol = nq.load_molecule(args["molecule"])
hilbert = nq.Hilbert.for_molecule(mol, restrict_to_ms=True)
h_r = nq.Hilbert(n_qubits=hilbert.n_qubits, sectors=hilbert.sectors,
                 n_exc_max=args["n_excitations_max"])
terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits,
                               n_excitations_max=args["n_excitations_max"])
s = mol.n_qubits // 2
cfg = NAQSConfig(
    n_qubits=mol.n_qubits, sectors=hilbert.sectors, masking="partial",
    amp_hidden=(args["n_hid"],) * args["n_layer"],
    phase_hidden=(args["n_hid_phase"],) * args["n_layer_phase"],
    shell_order=tuple(range(s - 1, -1, -1)),
)
tr = VMCTrainer(cfg, terms, h_r, TrainConfig(n_train=1, seed=11), save_loc=RUN)
tr.load(params_only=True)
e_before = tr.exact_energy()
print(f"before: {e_before:.6f} ({1000 * (e_before - mol.fci_energy):+.3f} mHa)",
      flush=True)
t0 = time.time()
e0, n = tr.warm_start_from_solve_h(states=h_r.basis, n_epochs=N_EP,
                                   loss="overlap", lr=LR)
e_after = tr.exact_energy()
print(f"after overlap fit ({N_EP} ep, lr {LR}, {time.time()-t0:.0f}s): "
      f"{e_after:.6f} ({1000 * (e_after - mol.fci_energy):+.3f} mHa; "
      f"E0={e0:.6f})", flush=True)
