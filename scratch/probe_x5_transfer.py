"""Probe the two full-space transfer paths for the x5 CISDTQ-exact model.

The pw production-window stage needs EITHER (a) the partial-mask x5 model
to sample efficiently (round-3 measured 91.5% ancestral mass loss on the
half-trained x4b model — is a converged model better?), or (b) a cheap
full-mask re-interpretation of the same params (the full-mask model with
x5's weights is a renormalized cousin; round 3 never measured its energy
from a GOOD starting point).

Usage: python scratch/probe_x5_transfer.py [RUN_DIR]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join("data", "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

import naqs_tpu as nq
from naqs_tpu.models.nade import NAQSConfig
from naqs_tpu.sampler import sample
from naqs_tpu.trainer import TrainConfig, VMCTrainer

RUN = sys.argv[1] if len(sys.argv) > 1 else "data/fleet/h2o_631g_x5"
args = json.load(open(os.path.join(RUN, "args.json")))
mol = nq.load_molecule(args["molecule"])
hilbert = nq.Hilbert.for_molecule(mol, restrict_to_ms=True)
h_cisdtq = nq.Hilbert(n_qubits=hilbert.n_qubits, sectors=hilbert.sectors,
                      n_exc_max=args["n_excitations_max"])
terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits,
                               n_excitations_max=args["n_excitations_max"])
s = mol.n_qubits // 2


def cfg_for(masking):
    return NAQSConfig(
        n_qubits=mol.n_qubits, sectors=hilbert.sectors, masking=masking,
        amp_hidden=(args["n_hid"],) * args["n_layer"],
        phase_hidden=(args["n_hid_phase"],) * args["n_layer_phase"],
        use_amp_spin_sym=not args.get("no_amp_sym"),
        aggregate_phase=not args.get("single_phase", True),
        shell_order=tuple(range(s - 1, -1, -1)),
    )


results = {}
for masking in ["partial", "full"]:
    cfg = cfg_for(masking)
    tr = VMCTrainer(cfg, terms, h_cisdtq, TrainConfig(n_train=1, seed=11),
                    save_loc=RUN)
    tr.load(params_only=True)
    e = tr.exact_energy()
    results[f"exact_{masking}"] = e
    print(f"[{masking}] exact CISDTQ energy: {e:.6f} "
          f"({1000 * (e - mol.fci_energy):+.3f} mHa vs FCI)", flush=True)

    # sampler mass retention + unique yield at rising n_samps
    for n_samps in [1e7, 1e8]:
        k = jax.random.PRNGKey(5)
        t0 = time.time()
        b = sample(cfg, tr.params, k, jnp.float64(n_samps), 131072)
        counts, n_unq, ovf = jax.device_get((b.counts, b.n_unique, b.overflow))
        kept = counts.sum()
        print(f"[{masking}] n_samps={n_samps:.0e}: retained "
              f"{100 * kept / n_samps:.1f}% mass, {int(n_unq)} uniques, "
              f"overflow={bool(ovf)} ({time.time() - t0:.0f}s)", flush=True)

print(json.dumps(results))
