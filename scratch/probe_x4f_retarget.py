"""Retarget-loss shootout on the real H2O 6-31G CISDTQ full-mask model.

Round-3 finding: the democratic log-amp MSE eigenvector fit REGRESSES the
already-good full-mask x4f model (-76.114 -> -75.96). This probe measures
each candidate fit objective (trainer.pre_train_targets loss modes) from
the committed x4f checkpoint against the 149,661-state CISDTQ eigenvector,
reporting post-fit exact <psi|H|psi>.

Usage: python scratch/probe_x4f_retarget.py [protocol ...]
  protocol = name:loss:select_min:epochs:lr  (or 'none')
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join("data", "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import naqs_tpu as nq
from naqs_tpu.models.nade import NAQSConfig
from naqs_tpu.trainer import TrainConfig, VMCTrainer
from naqs_tpu.hamiltonian import assemble_sparse_hamiltonian_np

RUN = "data/fleet/h2o_631g_x4f"
EIG_CACHE = "scratch/x4f_eigvec.npz"
args = json.load(open(os.path.join(RUN, "args.json")))

mol = nq.load_molecule(args["molecule"])
hilbert = nq.Hilbert.for_molecule(mol, restrict_to_ms=True)
hilbert = nq.Hilbert(n_qubits=hilbert.n_qubits, sectors=hilbert.sectors,
                     n_exc_max=args["n_excitations_max"])
s = mol.n_qubits // 2
cfg = NAQSConfig(
    n_qubits=mol.n_qubits,
    sectors=hilbert.sectors,
    masking="full",
    amp_hidden=(args["n_hid"],) * args["n_layer"],
    phase_hidden=(args["n_hid_phase"],) * args["n_layer_phase"],
    use_amp_spin_sym=not args.get("no_amp_sym"),
    use_phase_spin_sym=args.get("phase_sym", False),
    aggregate_phase=not args.get("single_phase", True),
    num_lut=args.get("n_lut", 0),
    combined_amp_phase=args.get("comb_amp_phase", False),
    shell_order=tuple(range(s - 1, -1, -1)),
    input_encoding=args.get("input_encoding", "binary"),
)
terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits,
                               n_excitations_max=args["n_excitations_max"])
tr = VMCTrainer(cfg, terms, hilbert, TrainConfig(n_train=10, seed=11),
                save_loc=RUN)
tr.load("checkpoint", params_only=True)
p0 = jax.tree.map(lambda x: x.copy(), tr.params)

basis = np.sort(np.asarray(hilbert.basis, dtype=np.uint64))
if os.path.exists(EIG_CACHE):
    z = np.load(EIG_CACHE)
    states, vec, e0 = z["states"], z["vec"], float(z["e0"])
    print(f"loaded cached eigvec: {len(states)} states, e0={e0:.6f}")
else:
    from scipy.sparse.linalg import eigsh

    t0 = time.time()
    H = assemble_sparse_hamiltonian_np(terms, basis)
    print(f"assembled H over {len(basis)} states in {time.time()-t0:.0f}s",
          flush=True)
    t0 = time.time()
    w, v = eigsh(H, k=1, which="SA")
    e0, vec, states = float(w[0]), v[:, 0], basis
    print(f"eigsh in {time.time()-t0:.0f}s: e0={e0:.6f}", flush=True)
    np.savez(EIG_CACHE, states=states, vec=vec, e0=e0)

print(f"FCI={mol.fci_energy:.6f}; CISDTQ floor - FCI = "
      f"{(e0-mol.fci_energy)*1e3:+.3f} mHa", flush=True)

t0 = time.time()
e_before = tr.exact_energy()
print(f"e_before = {e_before:.6f} ({(e_before-mol.fci_energy)*1e3:+.3f} mHa)"
      f" [{time.time()-t0:.0f}s]", flush=True)

DEFAULT = ["mse500:mse:1e-4:500:2e-3",
           "wmse1500:wmse:1e-4:1500:2e-3",
           "ovl1500:overlap:1e-4:1500:2e-3",
           "ovl+wmse:overlap:1e-4:1000:2e-3+wmse:1e-4:500:1e-3"]
protos = sys.argv[1:] or DEFAULT

for proto in protos:
    name, _, spec = proto.partition(":")
    tr.params = jax.tree.map(lambda x: x.copy(), p0)
    for stage in spec.split("+"):
        loss, sel, ep, lr = stage.split(":")
        sel, ep, lr = float(sel), int(ep), float(lr)
        keep = np.abs(vec) > sel * np.abs(vec).max()
        t0 = time.time()
        tr.pre_train_targets(states[keep], vec[keep].astype(np.complex128),
                             ep, lr=lr, loss=loss)
        print(f"  [{name}] stage {loss} over {keep.sum()} states: "
              f"{time.time()-t0:.0f}s", flush=True)
    e_after = tr.exact_energy()
    print(f"[{name}] e_after = {e_after:.6f} "
          f"({(e_after-mol.fci_energy)*1e3:+.3f} mHa vs FCI, "
          f"{(e_after-e0)*1e3:+.3f} vs CISDTQ floor)", flush=True)
