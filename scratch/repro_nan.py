"""Reproduce the post-warm-start NaN (VERDICT #5) on CPU from a trained ckpt."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

import naqs_tpu as nq
from naqs_tpu.models.nade import NAQSConfig
from naqs_tpu.trainer import TrainConfig, VMCTrainer, vmc_update
from naqs_tpu.sampler import sample
import json

job = "seeds_LiH_111"
args = json.load(open(f"data/fleet/{job}/args.json"))
mol = nq.load_molecule(args["molecule"])
hilbert = nq.Hilbert.for_molecule(mol, restrict_to_ms=True)
s = mol.n_qubits // 2
shell_order = tuple(range(s - 1, -1, -1))
cfg = NAQSConfig(
    n_qubits=mol.n_qubits, sectors=hilbert.sectors, masking="partial",
    amp_hidden=(64,), phase_hidden=(512, 512), use_amp_spin_sym=True,
    use_phase_spin_sym=False, aggregate_phase=False, num_lut=0,
    combined_amp_phase=False, shell_order=shell_order,
)
tc = TrainConfig(n_train=2500, n_samples=1e7, n_unq_samples_max=4096,
                 seed=args["resolved_seed"])
tr = VMCTrainer(cfg, nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits),
                hilbert, tc, save_loc=f"data/fleet/{job}")
tr.load()

def finite(tree):
    return all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree_util.tree_leaves(tree))

print("params finite after load:", finite(tr.params))
b = sample(cfg, tr.params, jax.random.key(0), jnp.float64(1e7), tr.capacity)
print("pre-WS sample: unq =", int(b.n_unique))
la, ph = nq.models.nade.log_psi(cfg, tr.params, b.states)
nu = int(b.n_unique)
print("la range over samples:", float(la[:nu].min()), float(la[:nu].max()),
      "finite:", bool(jnp.all(jnp.isfinite(la[:nu]))))

e0, n = tr.warm_start_from_solve_h(n_epochs=500, k_max=10000)
print("warm start e0", e0, "n", n)
print("params finite after warm start:", finite(tr.params))

b2 = sample(cfg, tr.params, jax.random.key(1), jnp.float64(1e7), tr.capacity)
print("post-WS sample: unq =", int(b2.n_unique), "overflow:", bool(b2.overflow))
la2, ph2 = nq.models.nade.log_psi(cfg, tr.params, b2.states)
nu2 = int(b2.n_unique)
if nu2:
    print("la2 range:", float(la2[:nu2].min()), float(la2[:nu2].max()),
          "finite:", bool(jnp.all(jnp.isfinite(la2[:nu2]))))
p3, o3, m3 = vmc_update(cfg, tr.optimizer, tr.params, tr.opt_state, tr.dt, b2, False)
print("step metrics:", {k: float(v) for k, v in m3.items()})
print("params finite after step:", finite(p3))
