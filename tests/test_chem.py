"""Tests for the from-scratch STO-3G + RHF pipeline (naqs_tpu.chem).

Replaces the Psi4 half of the reference's data-generation notebook
(notebooks/generate_molecular_data_and_baselines.ipynb): the tests pin the
recomputed Hehre-Stewart-Pople expansion against the universally published
STO-3G constants and the RHF energies against the stored Psi4 baselines
shipped with the reference molecules.
"""

import h5py
import numpy as np
import pytest

from naqs_tpu.chem.basis import universal_expansion
from naqs_tpu.chem.scf import rhf
from naqs_tpu.utils.molecule import _resolve_molecule_dir


def _load_geometry(name):
    import os

    path = os.path.join(_resolve_molecule_dir(name),
                        f"{name.split('/')[-1]}.hdf5")
    with h5py.File(path) as f:
        syms = [a.decode() for a in f["geometry/atoms"][()]]
        pos = f["geometry/positions"][()]
        hf_t = float(f["hf_energy"][()])
    return syms, pos, hf_t


def test_universal_1s_expansion_matches_published():
    # Hehre, Stewart, Pople 1969, Table I (zeta = 1): the defining STO-3G
    # 1s fit. We recompute it from scratch; it must land on the published
    # constants every quantum-chemistry package tabulates.
    alphas, coeffs = universal_expansion("1s")
    np.testing.assert_allclose(
        alphas, (2.227660, 0.405771, 0.109818), rtol=2e-5)
    np.testing.assert_allclose(
        coeffs["1s"], (0.154329, 0.535328, 0.444635), rtol=2e-4)


def test_universal_2sp_expansion_matches_published():
    alphas, coeffs = universal_expansion("2sp")
    np.testing.assert_allclose(
        alphas, (0.994203, 0.231031, 0.0751386), rtol=2e-5)
    np.testing.assert_allclose(
        coeffs["2s"], (-0.0999672, 0.399513, 0.700115), rtol=3e-4)
    np.testing.assert_allclose(
        coeffs["2p"], (0.155916, 0.607684, 0.391957), rtol=3e-4)


def test_h2_hf_matches_stored_psi4():
    syms, pos, hf_t = _load_geometry("H2")
    r = rhf(syms, pos, n_guesses=1)
    assert abs(r.e_hf - hf_t) < 1e-6


@pytest.mark.slow
def test_lih_hf_matches_stored_psi4():
    syms, pos, hf_t = _load_geometry("LiH")
    r = rhf(syms, pos, n_guesses=1)
    assert abs(r.e_hf - hf_t) < 1e-6


@pytest.mark.slow
def test_h2o_hf_and_mo_integrals_match_stored():
    syms, pos, hf_t = _load_geometry("H2O")
    r = rhf(syms, pos, n_guesses=1)
    assert abs(r.e_hf - hf_t) < 1e-6
    # MO integrals must reproduce the stored one/two-body tensors up to
    # orbital sign/degeneracy freedom — compare basis-independent
    # invariants instead of raw tensors.
    import os

    path = os.path.join(_resolve_molecule_dir("H2O"), "H2O.hdf5")
    with h5py.File(path) as f:
        h1_t = f["one_body_integrals"][()]
        h2_t = f["two_body_integrals"][()]
    assert np.allclose(np.sort(np.linalg.eigvalsh(r.one_body_mo)),
                       np.sort(np.linalg.eigvalsh(h1_t)), atol=5e-6)
    # trace invariants of the ERI tensor
    assert abs(np.einsum("pqqp->", r.two_body_mo)
               - np.einsum("pqqp->", h2_t)) < 1e-5
    assert abs(np.einsum("ppqq->", r.two_body_mo)
               - np.einsum("ppqq->", h2_t)) < 1e-5


@pytest.mark.slow
def test_h2s_hf_with_recovered_third_row_zetas():
    """Third-row S zetas are recovered from the stored Psi4 baselines
    (scratch/calibrate_zetas.py); the fit leaves a ~3 mHa HF residual
    (Psi4's tabulated third-row contractions are not an exact
    shared-exponent Slater refit), so the gate is 5 mHa."""
    syms, pos, hf_t = _load_geometry("H2S")
    r = rhf(syms, pos, n_guesses=1)
    assert abs(r.e_hf - hf_t) < 5e-3


@pytest.mark.slow
def test_ch2_open_shell_generation_matches_stored():
    """Full ROHF -> CCSD -> FCI generation for a triplet (CH2) reproduces
    the stored Psi4 baselines."""
    from naqs_tpu.chem.generate import generate_molecule_data

    import os

    path = os.path.join(_resolve_molecule_dir("CH2"), "CH2.hdf5")
    with h5py.File(path) as f:
        syms = [a.decode() for a in f["geometry/atoms"][()]]
        pos = f["geometry/positions"][()]
        stored = {k: float(f[k][()])
                  for k in ("hf_energy", "ccsd_energy", "fci_energy")}
    d = generate_molecule_data(syms, pos, multiplicity=3, name="CH2")
    for k, tol in (("hf_energy", 1e-7), ("ccsd_energy", 1e-6),
                   ("fci_energy", 1e-6)):
        assert abs(d[k] - stored[k]) < tol, k
    # CISD: ours is the raw n_exc<=2 determinant space from the single
    # ROHF reference; Psi4's open-shell CISD is spin-complete (adds the
    # semi-internal determinants needed to close the space under S^2),
    # which lowers it by ~2.6e-5 Ha on CH2 — closed-shell CISD matches to
    # 2e-8 (H2O), so the gate here is the documented space difference.
    with h5py.File(path) as f:
        assert abs(d["cisd_energy"] - float(f["cisd_energy"][()])) < 5e-5
