"""Bisect the li2o_xe TPU-worker crash: single vmc_update vs scan flushes.

The 25-step vmc_update_scan over the 644,365-state Li2O CISDTQ basis
crashed the TPU worker twice (fleet_round4c.log); a 5-call chained XL
local_energy program ran fine (probe_li2o_xl.log). Measure where the
boundary is: one plain vmc_update dispatch, then scan lengths 4 / 25.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join("data", "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

import naqs_tpu as nq
from naqs_tpu.models.nade import NAQSConfig, init_params
from naqs_tpu.ops.local_energy import DeviceTerms
from naqs_tpu.sampler import SampleBatch
from naqs_tpu.trainer import TrainConfig, vmc_update, vmc_update_scan

mol = nq.load_molecule("Li2O")
h = nq.Hilbert.for_molecule(mol, restrict_to_ms=True)
h = nq.Hilbert(n_qubits=h.n_qubits, sectors=h.sectors, n_exc_max=4)
terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits,
                               n_excitations_max=4)
s = mol.n_qubits // 2
cfg = NAQSConfig(n_qubits=mol.n_qubits, sectors=h.sectors, masking="partial",
                 amp_hidden=(64,), phase_hidden=(512, 512),
                 shell_order=tuple(range(s - 1, -1, -1)))
tc = TrainConfig(n_train=100, seed=11)
params = init_params(jax.random.PRNGKey(0), cfg)
opt = tc.make_optimizer()
opt_state = opt.init(params)
dt = DeviceTerms.from_terms(terms, hilbert=h)
basis = np.sort(np.asarray(h.basis, np.uint64))
batch = SampleBatch(states=jnp.asarray(basis),
                    counts=jnp.ones((len(basis),), jnp.float64),
                    n_unique=jnp.int32(len(basis)),
                    overflow=jnp.array(False))

t0 = time.time()
params1, opt1, m = vmc_update(cfg, opt, params, opt_state, dt, batch, True)
e = float(m["e_loc"])
print(f"single vmc_update OK: E={e:.6f} ({time.time()-t0:.0f}s)", flush=True)
t0 = time.time()
params1, opt1, m = vmc_update(cfg, opt, params1, opt1, dt, batch, True)
print(f"second update: E={float(m['e_loc']):.6f} "
      f"({time.time()-t0:.1f}s/step)", flush=True)

for flush in [4, 25]:
    t0 = time.time()
    p2, o2, ms = vmc_update_scan(cfg, opt, params, opt_state, dt, batch,
                                 jnp.int32(flush), length=flush)
    ms = np.asarray(ms)
    print(f"scan flush={flush} OK: E[0]={ms[0,0]:.6f} E[-1]={ms[flush-1,0]:.6f} "
          f"({(time.time()-t0)/flush:.1f}s/step incl compile)", flush=True)
