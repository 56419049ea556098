"""Where do the H2O 6-31G production-window 2.05 s/step go?

Times sample() and local_energy() separately at the fleet job's shapes
(capacity = n_unq_samps_max = 100000) on the TPU, readback-drained.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import naqs_tpu as nq
jax.config.update("jax_compilation_cache_dir", "data/jax_cache")
from naqs_tpu.models.nade import NAQSConfig, log_psi
from naqs_tpu.trainer import VMCTrainer, TrainConfig
from naqs_tpu.ops.local_energy import DeviceTerms, local_energy
from naqs_tpu.hamiltonian import PauliTerms
from naqs_tpu.sampler import sample

mol = nq.load_molecule("H2O_6-31G")
h = nq.Hilbert.for_molecule(mol)
with np.load("data/terms_cache/H2O_6-31G_terms.npz") as z:
    terms = PauliTerms(**{k: z[k] for k in z.files if k != "n_qubits"},
                       n_qubits=int(z["n_qubits"]))

s = h.n_qubits // 2
cfg = NAQSConfig(
    n_qubits=h.n_qubits, sectors=h.sectors, masking="full",
    amp_hidden=(64,), phase_hidden=(512, 512), aggregate_phase=False,
    shell_order=tuple(range(s - 1, -1, -1)),
)
tc = TrainConfig(seed=11, n_unq_samples_max=100000)
tr = VMCTrainer(cfg, terms, h, tc)
CAP = tr.capacity
print("capacity:", CAP, "Kxy:", len(terms.xy_unique), flush=True)


def timed(name, fn, n=10):
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / n
    print(f"{name:24s} {dt*1e3:8.1f} ms", flush=True)
    return out


key = jax.random.PRNGKey(0)
batch = timed("sample(1e8, cap=1e5)",
              lambda: sample(cfg, tr.params, key, jnp.float64(1e8), CAP))
print("n_unique:", int(batch.n_unique), flush=True)

la, ph = log_psi(cfg, tr.params, batch.states)
la = jnp.where(jnp.arange(CAP) < batch.n_unique, la, 0.0)
dt_terms = tr.dt
timed("log_psi(cap)", lambda: log_psi(cfg, tr.params, batch.states))
timed("local_energy(cap)",
      lambda: local_energy(dt_terms, batch.states, la, ph, batch.n_unique))
