"""Probe the warm-start NaN: retrain N2_1.8 to step 2500 on CPU, save, probe."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

import naqs_tpu as nq
from naqs_tpu.models.nade import NAQSConfig, log_psi
from naqs_tpu.trainer import TrainConfig, VMCTrainer, vmc_update, exact_energy
from naqs_tpu.sampler import sample

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

ckpt = "scratch/n2_18_state2500/checkpoint.msgpack"
if os.path.exists(ckpt):
    tr.load()
    print("loaded step", tr.n_steps)
else:
    tr.pre_flatten(20)
    tr.run(2500, output_freq=250)
    tr.save()

def finite(tree):
    return all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree_util.tree_leaves(tree))

print("params finite at 2500:", finite(tr.params))
e = float(exact_energy(cfg, tr.params, tr.dt, jnp.asarray(hilbert.basis)))
print("exact quadratic energy at 2500:", e)  # bug 1: expect nan
la_b, ph_b = log_psi(cfg, tr.params, jnp.asarray(hilbert.basis))
print("basis la: finite frac", float(jnp.mean(jnp.isfinite(la_b))),
      "min", float(la_b[jnp.isfinite(la_b)].min()), "max", float(la_b.max()),
      "n nan", int(jnp.sum(jnp.isnan(la_b))), "n -inf", int(jnp.sum(jnp.isneginf(la_b))))
print("basis ph: n nan", int(jnp.sum(jnp.isnan(ph_b))))

# --- warm start
e0, n = tr.warm_start_from_solve_h()
print("warm start:", e0, n)
print("params finite after WS:", finite(tr.params))
b = sample(cfg, tr.params, jax.random.key(5), jnp.float64(1e7), tr.capacity)
print("post-WS unq:", int(b.n_unique))
