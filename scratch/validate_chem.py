"""Validate chem pipeline HF energies vs stored Psi4 baselines."""
import sys, time
import h5py, numpy as np
sys.path.insert(0, "/root/repo")
from naqs_tpu.chem.scf import rhf

MOLS = ["H2", "LiH", "HF", "H2O", "NH3", "CH4", "C2", "N2", "F2", "LiF", "Li2O"]
for m in MOLS:
    try:
        with h5py.File(f"/root/reference/molecules/{m}/{m}.hdf5") as f:
            syms = [a.decode() for a in f["geometry/atoms"][()]]
            pos = f["geometry/positions"][()]
            hf_t = float(f["hf_energy"][()])
        t0 = time.time()
        r = rhf(syms, pos, n_guesses=2)
        print(f"{m:8s} HF={r.e_hf:+.6f} target={hf_t:+.6f} "
              f"d={1e3*(r.e_hf-hf_t):+8.3f} mHa  ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"{m:8s} FAIL: {e}", flush=True)
