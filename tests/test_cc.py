"""CCSD solver (naqs_tpu.chem.cc) vs the stored Psi4 ccsd_energy values.

The reference pipeline records Psi4 CCSD per molecule
(notebooks/generate_molecular_data_and_baselines.ipynb); these tests pin our
from-scratch spin-orbital CCSD to those stored numbers, starting from the
SAME stored MO integrals so the comparison isolates the CC solver itself.
"""

import os

import h5py
import numpy as np
import pytest

from naqs_tpu.chem.cc import ccsd_from_integrals
from naqs_tpu.utils.molecule import _resolve_molecule_dir


def _run(name):
    path = os.path.join(_resolve_molecule_dir(name), f"{name}.hdf5")
    with h5py.File(path) as f:
        res = ccsd_from_integrals(
            f["one_body_integrals"][()], f["two_body_integrals"][()],
            int(f["n_electrons"][()]), float(f["hf_energy"][()]),
            float(f["nuclear_repulsion"][()]))
        stored = float(f["ccsd_energy"][()])
        fci = float(f["fci_energy"][()])
    return res, stored, fci


def test_h2_ccsd_equals_fci():
    # 2 electrons: CCSD is exact, so this pins the solver to FCI itself
    res, stored, fci = _run("H2")
    assert res.converged
    assert abs(res.e_ccsd - fci) < 1e-8
    assert abs(res.e_ccsd - stored) < 1e-7


def test_lih_ccsd_matches_stored():
    res, stored, _ = _run("LiH")
    assert res.converged
    assert abs(res.e_ccsd - stored) < 1e-6


def test_h2o_ccsd_matches_stored():
    res, stored, _ = _run("H2O")
    assert res.converged
    assert abs(res.e_ccsd - stored) < 1e-6


@pytest.mark.slow
def test_n2_ccsd_matches_stored():
    res, stored, _ = _run("N2")
    assert res.converged
    assert abs(res.e_ccsd - stored) < 1e-6


def test_o2_rohf_ccsd_matches_stored():
    # open-shell (triplet, ROHF reference): occupied spin orbitals are
    # alpha 0..8 / beta 0..6, not an interleaved prefix
    path = os.path.join(_resolve_molecule_dir("O2"), "O2.hdf5")
    with h5py.File(path) as f:
        res = ccsd_from_integrals(
            f["one_body_integrals"][()], f["two_body_integrals"][()],
            int(f["n_electrons"][()]), float(f["hf_energy"][()]),
            float(f["nuclear_repulsion"][()]), n_alpha=9, n_beta=7)
        stored = float(f["ccsd_energy"][()])
    assert res.converged
    assert abs(res.e_ccsd - stored) < 1e-6
