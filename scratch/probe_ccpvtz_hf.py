"""Why doesn't H2 cc-pVTZ concentrate on HF after pre_train_hf?

CPU probe: build the CLI-equivalent model, pretrain toward HF, inspect the
exact distribution over the 784-state restricted basis.
"""
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import naqs_tpu as nq
from naqs_tpu.models.nade import NAQSConfig, init_params, log_psi
from naqs_tpu.trainer import VMCTrainer, TrainConfig
from naqs_tpu.ops.local_energy import DeviceTerms

mol = nq.load_molecule("H2_cc-pvtz")
h = nq.Hilbert.for_molecule(mol)
print("hilbert:", h.n_qubits, "qubits,", h.size, "states, sectors", h.sectors)
import numpy as _np
from naqs_tpu.hamiltonian import PauliTerms
with _np.load("data/terms_cache/H2_cc-pvtz_terms.npz") as z:
    terms = PauliTerms(**{k: z[k] for k in z.files if k != "n_qubits"},
                       n_qubits=int(z["n_qubits"]))

s = h.n_qubits // 2
cfg = NAQSConfig(
    n_qubits=h.n_qubits, sectors=h.sectors,
    amp_hidden=(64,), phase_hidden=(512, 512),
    aggregate_phase=False,
    shell_order=tuple(range(s - 1, -1, -1)),
)
tc = TrainConfig(seed=11)
tr = VMCTrainer(cfg, terms, h, tc)

basis = jnp.asarray(h.basis)
hf = h.hf_state()
print("HF state:", hf, "in basis:", np.any(h.basis == hf))

def dist(params):
    la, ph = log_psi(cfg, params, basis)
    la = np.asarray(la, dtype=np.float64)
    p = np.exp(2 * (la - la.max()))
    p /= p.sum()
    return la, p

la0, p0 = dist(tr.params)
i_hf = int(np.nonzero(h.basis == hf)[0][0])
print(f"init: p(HF)={p0[i_hf]:.4g} max_p={p0.max():.4g} la(HF)={la0[i_hf]:.4f}")

for rounds in range(4):
    tr.pre_train_hf(125)
    la1, p1 = dist(tr.params)
    print(f"after {(rounds+1)*125} ep: p(HF)={p1[i_hf]:.4g} "
          f"max_p={p1.max():.4g} argmax={np.argmax(p1)} la(HF)={la1[i_hf]:.4f}",
          flush=True)

# exact energy at this point
e = tr.exact_energy()
print("exact <E> after pretrain:", e, "HF energy:", mol.hf_energy)
