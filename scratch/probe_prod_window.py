"""Time fused VMC steps at the production window (cap=100000) on the TPU.

Measures H2O_6-31G and H4O2 step time so the round-3 fleet budget is set
from data, not guesswork. Uses the CLI's compile cache.
"""
import os, sys, time
import jax
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("NAQS_TPU_COMPILE_CACHE", os.path.join("data", "jax_cache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

import naqs_tpu as nq
from naqs_tpu.models.nade import NAQSConfig
from naqs_tpu.trainer import TrainConfig, VMCTrainer

MOL = sys.argv[1] if len(sys.argv) > 1 else "H2O_6-31G"
FULL_MASK = MOL == "H2O_6-31G"

mol = nq.load_molecule(MOL)
hilbert = nq.Hilbert.for_molecule(mol, restrict_to_ms=True)
s = mol.n_qubits // 2
cfg = NAQSConfig(
    n_qubits=mol.n_qubits, sectors=hilbert.sectors,
    masking="full" if FULL_MASK else "partial",
    amp_hidden=(64,), phase_hidden=(512, 512), use_amp_spin_sym=True,
    use_phase_spin_sym=False, aggregate_phase=False, num_lut=0,
    combined_amp_phase=False, shell_order=tuple(range(s - 1, -1, -1)),
)
tc = TrainConfig(n_train=10000, n_samples=1e7, n_unq_samples_min=10000,
                 n_unq_samples_max=100000, seed=11)
terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
print(f"{MOL}: {mol.n_qubits}q, space {hilbert.size}, terms {len(terms.coeff)} "
      f"(Kxy {len(terms.xy_unique)}, Kyz {len(terms.yz_unique)})", flush=True)
tr = VMCTrainer(cfg, terms, hilbert, tc)
t0 = time.time()
out = tr.step()
print(f"step 1 (compile): {time.time()-t0:.1f}s  {out}", flush=True)
t0 = time.time()
N = 15
for i in range(N):
    out = tr.step()
    print(f"step {tr.n_steps}: e={out['e_loc']:.6f} unq={out['n_unique']} "
          f"t={out['time']*1000:.0f}ms", flush=True)
print(f"steady-state: {(time.time()-t0)/N*1000:.0f} ms/step", flush=True)
