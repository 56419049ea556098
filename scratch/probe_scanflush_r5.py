"""Round-5 probe: find the actual size boundary of the exact-mode scan-flush
crash (VERDICT r4 #7).

Round-4 observation: vmc_update_scan over Li2O CISDTQ (644,365 states) with
length=25 reproducibly crashed the axon TPU worker (kernel fault), while
length=4 ran fine and H2O 6-31G CISDTQ (149,661 states) x 25 was stable.
run_exact since caps the dispatch at ~3e6 state-steps — a guess.

This sweeps scan length on the real Li2O CISDTQ shape, each attempt in a
SUBPROCESS with a hard timeout so a wedged tunnel kills only the child.
RUN ONLY WHEN NO OTHER JOB OWNS THE CHIP (a crash can wedge the tunnel for
the whole process group; observed recovery: new processes are fine).

Usage: python scratch/probe_scanflush_r5.py [max_len]
"""

import subprocess
import sys
import time

CHILD = r"""
import numpy as np, jax, time, sys
import jax.numpy as jnp
import naqs_tpu as nq
from naqs_tpu.hamiltonian import PauliTerms
from naqs_tpu.models.nade import NAQSConfig, init_params
from naqs_tpu.ops.local_energy import DeviceTerms
from naqs_tpu.sampler import SampleBatch
from naqs_tpu.trainer import TrainConfig, vmc_update_scan

length = int(sys.argv[1])
z = np.load('data/terms_cache/Li2O_4exc_terms.npz')
terms = PauliTerms(**{k: z[k] for k in z.files
                      if k not in ("n_qubits", "fingerprint")},
                   n_qubits=int(z["n_qubits"]))
mol = nq.load_molecule("Li2O")
h0 = nq.Hilbert.for_molecule(mol)
h = nq.Hilbert(n_qubits=h0.n_qubits, sectors=h0.sectors, n_exc_max=4)
cfg = NAQSConfig(n_qubits=mol.n_qubits, sectors=h.sectors,
                 amp_hidden=(64,), phase_hidden=(512, 512), masking="full")
tc = TrainConfig(use_lr_schedule=False)
opt = tc.make_optimizer()
params = init_params(jax.random.key(0), cfg)
opt_state = opt.init(params)
dt = DeviceTerms.from_terms(terms, hilbert=h)
basis = np.sort(h.basis)
batch = SampleBatch(states=jnp.asarray(basis),
                    counts=jnp.ones((len(basis),), jnp.float64),
                    n_unique=jnp.int32(len(basis)),
                    overflow=jnp.array(False))
t0 = time.time()
params, opt_state, ms = vmc_update_scan(
    cfg, opt, params, opt_state, dt, batch, jnp.int32(length),
    length=length)
ms = np.asarray(ms)
print(f"OK length={length}: {time.time()-t0:.1f}s, "
      f"E0={ms[0,0]:.6f} E_last={ms[length-1,0]:.6f}", flush=True)
"""


def main():
    max_len = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    for length in [4, 6, 8, 12, 16, 20, max_len]:
        if length > max_len:
            break
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c", CHILD, str(length)],
                timeout=1800, capture_output=True, text=True)
            tail = (r.stdout or "").strip().splitlines()[-1:] or ["<no out>"]
            print(f"length={length}: rc={r.returncode} "
                  f"({time.time()-t0:.0f}s) {tail[0]}", flush=True)
            if r.returncode != 0:
                err = (r.stderr or "").strip().splitlines()[-3:]
                print("  stderr tail:", *err, sep="\n  ", flush=True)
                break
        except subprocess.TimeoutExpired:
            print(f"length={length}: TIMEOUT after {time.time()-t0:.0f}s "
                  "(wedge) — stopping sweep", flush=True)
            break


if __name__ == "__main__":
    main()
