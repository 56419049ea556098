"""LR-schedule probe for the exact-mode tail on H2O 6-31G CISDTQ full-mask.

The x4f chain decelerates at +7 mHa under the production schedule floor
5e-4. Exact mode is full-batch (no sampling noise), so if the plateau is
Adam's oscillation floor, a lower LR should step DOWN in energy; if it is
a flat landscape, a higher LR restart should. Measures both from the
committed checkpoint.

Usage: python scratch/probe_x4f_lr.py [lr ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join("data", "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import naqs_tpu as nq
from naqs_tpu.models.nade import NAQSConfig
from naqs_tpu.trainer import TrainConfig, VMCTrainer

RUN = "data/fleet/h2o_631g_x4f"
args = json.load(open(os.path.join(RUN, "args.json")))

mol = nq.load_molecule(args["molecule"])
hilbert = nq.Hilbert.for_molecule(mol, restrict_to_ms=True)
hilbert = nq.Hilbert(n_qubits=hilbert.n_qubits, sectors=hilbert.sectors,
                     n_exc_max=args["n_excitations_max"])
s = mol.n_qubits // 2
cfg = NAQSConfig(
    n_qubits=mol.n_qubits,
    sectors=hilbert.sectors,
    masking="full",
    amp_hidden=(args["n_hid"],) * args["n_layer"],
    phase_hidden=(args["n_hid_phase"],) * args["n_layer_phase"],
    use_amp_spin_sym=not args.get("no_amp_sym"),
    use_phase_spin_sym=args.get("phase_sym", False),
    aggregate_phase=not args.get("single_phase", True),
    num_lut=args.get("n_lut", 0),
    combined_amp_phase=args.get("comb_amp_phase", False),
    shell_order=tuple(range(s - 1, -1, -1)),
    input_encoding=args.get("input_encoding", "binary"),
)
terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits,
                               n_excitations_max=args["n_excitations_max"])
FCI = mol.fci_energy

lrs = [float(x) for x in sys.argv[1:]] or [5e-4, 2e-3, 1e-4, 3e-5]
N_STEPS = 2000
for lr in lrs:
    tc = TrainConfig(n_train=N_STEPS, lr=lr, use_lr_schedule=False, seed=11)
    tr = VMCTrainer(cfg, terms, hilbert, tc, save_loc=RUN)
    tr.load("checkpoint", params_only=True)
    t0 = time.time()
    tr.run_exact(N_STEPS, output_freq=500)
    tail = np.mean([v for _, v in tr.log["E_LOC"][-100:]])
    print(f"[lr={lr:g}] trail100 E = {tail:.6f} ({(tail-FCI)*1e3:+.3f} mHa) "
          f"[{time.time()-t0:.0f}s]", flush=True)
