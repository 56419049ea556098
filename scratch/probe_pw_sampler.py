"""Probe: why does h2o_631g_pw's sample-count controller pin at 1e8 with
only ~700 uniques?  Loads the pw checkpoint on CPU and samples at rising
n_samples, printing (n_unique, overflow) for each."""
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

RUN = "data/fleet/h2o_631g_pw_partial_postmortem"
args = json.load(open(os.path.join(RUN, "args.json")))

mol = nq.load_molecule(args["molecule"].replace("/root/repo/", "").split("_singlet")[0]
                       if "_singlet" in args["molecule"] else args["molecule"])
hilbert = nq.Hilbert.for_molecule(mol, restrict_to_ms=True)
s = mol.n_qubits // 2
shell_order = tuple(range(s - 1, -1, -1))
cfg = NAQSConfig(
    n_qubits=mol.n_qubits,
    sectors=hilbert.sectors,
    masking="full",
    amp_hidden=(64,),
    phase_hidden=(512, 512),
    use_amp_spin_sym=True,
    use_phase_spin_sym=False,
    aggregate_phase=False,
    num_lut=0,
    combined_amp_phase=False,
    shell_order=shell_order,
    input_encoding="binary",
)
terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
tc = TrainConfig(n_train=10, seed=11)
tr = VMCTrainer(cfg, terms, hilbert, tc, save_loc=RUN)
tr.load("checkpoint", params_only=True)

cap = 100000
key = jax.random.PRNGKey(7)
for ns in [1e6, 1e7, 1e8, 1e9, 1e10]:
    key, k = jax.random.split(key)
    b = sample(cfg, tr.params, k, jnp.float64(ns), cap)
    nu, ovf = int(b.n_unique), bool(b.overflow)
    cs = np.asarray(b.counts)
    print(f"n_samples={ns:.0e}: n_unique={nu}, overflow={ovf}, "
          f"count_sum={cs.sum():.6g}, max_count={cs.max():.6g}", flush=True)
