"""Full-FCI validation of the from-scratch 6-31G generation pipeline.

Regenerates H2O 6-31G end-to-end with naqs_tpu.chem (explicit 6-31G
primitive tables -> McMurchie-Davidson integrals -> DIIS RHF -> MP2 ->
spin-orbital CCSD -> CISD + full-FCI sector diagonalization over the
C(13,5)^2 = 1.66M-state singlet sector of OUR Jordan-Wigner operator)
and compares every baseline against the stored Psi4 values shipped with
the reference (molecules/H2O_6-31G, reference notebook
notebooks/generate_molecular_data_and_baselines.ipynb).

Measured 2026-08-18 (single CPU core, row-blocked sparse assembly +
eigsh; ~3.6 h, ~60 GB peak for the 1.66M-state eigensolve):

    HF   -75.98338639450198   stored -75.98338639448784   (1.4e-11)
    CISD -76.11448323852088   stored -76.11448323869074   (1.7e-10)
    FCI  -76.12143812340379   stored -76.12143812340328   (5.1e-13)
    CCSD -76.11986617848744   stored -76.11986619998446   (2.1e-8)
    MP2  -76.11330094262826   stored -76.11330182936838   (8.9e-7;
         stored is Psi4 DF-MP2 — density-fitted — ours conventional)

Output folder: data/generated/H2O_6-31G_gen (hdf5 in the stored-data
layout; loadable by naqs_tpu.load_molecule and trainable directly).
"""

import time

import numpy as np

import naqs_tpu as nq
from naqs_tpu.chem.generate import generate_molecule_data, write_molecule_dir

stored = nq.load_molecule("H2O_6-31G")

t0 = time.time()
data = generate_molecule_data(
    ["O", "H", "H"],
    np.array([[0.0, 0.0, 0.0],
              [0.2774, 0.8929, 0.2544],
              [0.6068, -0.2383, -0.7169]]),
    name="H2O_6-31G_gen",
    basis_name="6-31g",
    fci_max_states=2_000_000,
)
print(f"took {time.time() - t0:.1f}s")

for ours_key, stored_val in [
    ("hf_energy", stored.hf_energy),
    ("cisd_energy", getattr(stored, "cisd_energy", None)),
    ("fci_energy", stored.fci_energy),
    ("ccsd_energy", stored.ccsd_energy),
]:
    if data.get(ours_key) is None or stored_val is None:
        continue
    print(f"{ours_key:12s} {data[ours_key]:.14f}  stored {stored_val:.14f}  "
          f"(diff {abs(data[ours_key] - stored_val):.1e})")

assert abs(data["fci_energy"] - stored.fci_energy) < 1e-9
path = write_molecule_dir(data, "data/generated/H2O_6-31G_gen")
print("written", path)
