"""Probe ancestral-sampler mass retention / unique growth for a fleet run.

Partial masking can lose sample mass to dead-end prefixes (children that
cannot complete to valid electron counts get killed late by the mask,
reference nade.py:694-695 semantics); this measures how much, and whether
the capacity buffer overflows, at rising n_samples.

Usage: python scratch/probe_pw_sampler.py RUN_DIR [masking] [capacity]
  masking  override ('partial'/'full'/'none'); default = the run's own
  capacity frontier buffer size; default 100000
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import json

import jax.numpy as jnp
import numpy as np

import naqs_tpu as nq
from naqs_tpu.models.nade import NAQSConfig
from naqs_tpu.sampler import sample
from naqs_tpu.trainer import TrainConfig, VMCTrainer

RUN = sys.argv[1] if len(sys.argv) > 1 else "data/fleet/h2o_631g_pw_partial_postmortem"
args = json.load(open(os.path.join(RUN, "args.json")))
masking = (sys.argv[2] if len(sys.argv) > 2 else
           ("none" if args.get("no_mask_psi") else
            "full" if args.get("full_mask_psi") else "partial"))
cap = int(sys.argv[3]) if len(sys.argv) > 3 else 100000

mol = nq.load_molecule(args["molecule"])
hilbert = nq.Hilbert.for_molecule(mol, restrict_to_ms=True)
s = mol.n_qubits // 2
assert args.get("qubit_ordering", -1) == -1
shell_order = tuple(range(s - 1, -1, -1))
m_s = abs(mol.n_alpha_electrons - mol.n_beta_electrons) // 2
cfg = NAQSConfig(
    n_qubits=mol.n_qubits,
    sectors=hilbert.sectors,
    masking=masking,
    amp_hidden=(args["n_hid"],) * args["n_layer"],
    phase_hidden=(args["n_hid_phase"],) * args["n_layer_phase"],
    use_amp_spin_sym=not args.get("no_amp_sym") and m_s == 0,
    use_phase_spin_sym=args.get("phase_sym", False),
    aggregate_phase=not args.get("single_phase", True),
    num_lut=args.get("n_lut", 0),
    combined_amp_phase=args.get("comb_amp_phase", False),
    shell_order=shell_order,
    input_encoding=args.get("input_encoding", "binary"),
)
terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
tr = VMCTrainer(cfg, terms, hilbert, TrainConfig(n_train=10, seed=11),
                save_loc=RUN)
tr.load("checkpoint", params_only=True)

print(f"run={RUN} masking={masking} capacity={cap}")
key = jax.random.PRNGKey(7)
for ns in [1e6, 1e7, 1e8, 1e9]:
    key, k = jax.random.split(key)
    b = sample(cfg, tr.params, k, jnp.float64(ns), cap)
    nu, ovf = int(b.n_unique), bool(b.overflow)
    cs = np.asarray(b.counts)
    print(f"n_samples={ns:.0e}: n_unique={nu}, overflow={ovf}, "
          f"retained={cs.sum() / ns:.4f}, max_count={cs.max():.6g}",
          flush=True)
