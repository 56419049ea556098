"""Validate the warm-start fix on the saved N2_1.8 step-2500 state (CPU)."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join("data", "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import numpy as np
import jax.numpy as jnp

import naqs_tpu as nq
from naqs_tpu.models.nade import NAQSConfig, log_psi
from naqs_tpu.trainer import TrainConfig, VMCTrainer
from naqs_tpu.sampler import sample

CLAMP = float(sys.argv[1]) if len(sys.argv) > 1 else 1e-30

mol = nq.load_molecule("N2_1.8")
hilbert = nq.Hilbert.for_molecule(mol, restrict_to_ms=True)
s = mol.n_qubits // 2
cfg = NAQSConfig(
    n_qubits=mol.n_qubits, sectors=hilbert.sectors, masking="partial",
    amp_hidden=(64,), phase_hidden=(512, 512), use_amp_spin_sym=True,
    use_phase_spin_sym=False, aggregate_phase=False, num_lut=0,
    combined_amp_phase=False, shell_order=tuple(range(s - 1, -1, -1)),
)
tc = TrainConfig(n_train=5000, n_samples=1e7, n_unq_samples_min=256,
                 n_unq_samples_max=4096, seed=11)
terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
tr = VMCTrainer(cfg, terms, hilbert, tc, save_loc="scratch/n2_18_state2500")
tr.load()
print("loaded step", tr.n_steps, flush=True)

# --- emulate warm_start_from_solve_h with a configurable clamp/selection
from scipy.sparse.linalg import eigsh
from naqs_tpu.hamiltonian import assemble_sparse_hamiltonian_np

tr.key, k = jax.random.split(tr.key)
batch = sample(cfg, tr.params, k, jnp.float64(tr.n_samples), tr.capacity)
nu = int(batch.n_unique)
states = np.sort(np.asarray(batch.states)[:nu])
H = assemble_sparse_hamiltonian_np(terms, states)
w, v = eigsh(H, k=1, which="SA")
vec, e0 = v[:, 0], w[0]
print(f"subspace E0={e0:.6f} over {len(states)} states", flush=True)
mag = np.abs(vec)
frac = mag / mag.max()
print("eigvec |v|/max percentiles:",
      {q: float(np.percentile(frac, q)) for q in (1, 10, 50, 90, 99)}, flush=True)
keep = frac > CLAMP  # select meaningful entries only
print(f"clamp {CLAMP:g}: keeping {keep.sum()}/{len(states)} states", flush=True)
tr.pre_train_targets(states[keep], vec[keep].astype(np.complex128), 500, lr=2e-3)

b = sample(cfg, tr.params, jax.random.key(7), jnp.float64(1e7), tr.capacity)
print("post-WS unq:", int(b.n_unique), flush=True)
for i in range(40):
    out = tr.step()
    if i % 5 == 0 or i == 39:
        print(f"step {tr.n_steps}: e={out['e_loc']:.6f} unq={out['n_unique']} "
              f"nsamp={out['n_samples']:.1e}", flush=True)
import math
ok = all(math.isfinite(v) for _, v in tr.log["E_LOC"][-40:])
print("all finite:", ok, flush=True)
