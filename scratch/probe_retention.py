import os, sys
sys.path.insert(0, '/root/repo')
os.environ["JAX_PLATFORMS"]="cpu"
import jax; jax.config.update("jax_platforms","cpu")
import json, time
import numpy as np, jax.numpy as jnp
import naqs_tpu as nq
from naqs_tpu.models.nade import NAQSConfig
from naqs_tpu.sampler import sample
from naqs_tpu.trainer import TrainConfig, VMCTrainer

RUN = sys.argv[1]
args = json.load(open(os.path.join(RUN, "args.json")))
mol = nq.load_molecule(args["molecule"])
hilbert = nq.Hilbert.for_molecule(mol, restrict_to_ms=True)
h_r = nq.Hilbert(n_qubits=hilbert.n_qubits, sectors=hilbert.sectors,
                 n_exc_max=args["n_excitations_max"]) if args.get("n_excitations_max",-1)>0 else hilbert
terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits,
                               n_excitations_max=args.get("n_excitations_max",-1) if args.get("n_excitations_max",-1)>0 else None)
s = mol.n_qubits // 2
for masking in ["partial", "full"]:
    cfg = NAQSConfig(
        n_qubits=mol.n_qubits, sectors=hilbert.sectors, masking=masking,
        amp_hidden=(args["n_hid"],) * args["n_layer"],
        phase_hidden=(args["n_hid_phase"],) * args["n_layer_phase"],
        shell_order=tuple(range(s - 1, -1, -1)),
    )
    tr = VMCTrainer(cfg, terms, h_r, TrainConfig(n_train=1, seed=11), save_loc=RUN)
    tr.load(params_only=True)
    for n_samps in [1e7, 1e8]:
        t0=time.time()
        b = sample(cfg, tr.params, jax.random.PRNGKey(5), jnp.float64(n_samps), 131072)
        counts, n_unq, ovf = jax.device_get((b.counts, b.n_unique, b.overflow))
        print(f"[{masking}] n={n_samps:.0e}: retained {100*counts.sum()/n_samps:.1f}% "
              f"uniques={int(n_unq)} overflow={bool(ovf)} ({time.time()-t0:.0f}s)", flush=True)
