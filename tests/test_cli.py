"""CLI driver end-to-end (subprocess, CPU)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # -platform cpu: the env var alone is overridden by the axon
    # sitecustomize, which would silently put these runs on the tunneled
    # TPU (a ~45 s remote compile per program)
    return subprocess.run(
        [sys.executable, "-m", "naqs_tpu.cli", "-platform", "cpu", *args],
        # generous: the 1-core CI host often runs a training fleet and the
        # axon remote-compile relay concurrently with the test suite
        cwd=cwd, env=env, capture_output=True, text=True, timeout=2700,
    )


@pytest.mark.slow
def test_cli_h2_end_to_end(tmp_path):
    r = _run_cli(
        ["-m", "H2", "-n_train", "150", "-n_samps", "100000",
         "-n_unq_samps_min", "4", "-n_unq_samps_max", "16", "-n_hid", "16",
         "-n_pretrain", "20", "-single_phase", "-s", "7",
         "-output_freq", "100", "-o", str(tmp_path / "out"), "-devices", "1"],
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.load(open(tmp_path / "out" / "summary.json"))
    assert summary["vmc_fci_chem_acc"] is True
    assert os.path.exists(tmp_path / "out" / "checkpoint.msgpack")
    assert os.path.exists(tmp_path / "out" / "training.png")


def test_cli_rejects_conflicting_masks(tmp_path):
    r = _run_cli(["-m", "H2", "-no_mask_psi", "-full_mask_psi"], cwd=tmp_path)
    assert r.returncode != 0
    assert "at most one" in r.stderr


@pytest.mark.slow
def test_cli_exact_sampling_mode(tmp_path):
    r = _run_cli(
        ["-m", "H2", "-n_train", "150", "-exact_sampling", "-n_hid", "16",
         "-lr", "0.005", "-s", "3", "-o", str(tmp_path / "out2"),
         "-output_freq", "100", "-devices", "1"],
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.load(open(tmp_path / "out2" / "summary.json"))
    assert summary["e_exact_final"] < -0.95


@pytest.mark.slow
def test_cli_no_restrictedH_trains_over_n_up_space(tmp_path):
    """-no_restrictedH must actually train over the unrestricted (total-
    electron-count) space, not just unmask the model (round-1 gap)."""
    from naqs_tpu.cli import run

    res = run(["-m", "H2", "-n_train", "400", "-lr", "2e-3", "-n_hid", "16",
               "-n_unq_samps_min", "1", "-n_unq_samps_max", "36",
               "-no_restrictedH", "-o", str(tmp_path), "-s", "5"])
    s = res["run_0"]
    # exact energy is evaluated over the full N_up basis (6 states for H2:
    # all spin splits of 2 electrons in 2 orbitals)
    assert s["e_exact_final"] < s["hf_energy"]
    assert s["e_exact_final"] > s["fci_energy"] - 1e-6  # variational


@pytest.mark.slow
def test_cli_n_excitations_max(tmp_path):
    """-n_excitations_max restricts both the compiled terms and the basis."""
    from naqs_tpu.cli import run

    res = run(["-m", "LiH", "-n_train", "30", "-n_hid", "8",
               "-n_unq_samps_min", "1", "-n_unq_samps_max", "64",
               "-n_excitations_max", "2", "-presolveH",
               "-o", str(tmp_path), "-s", "5"])
    # CISD-truncated presolve: above FCI but below HF
    e0 = res["presolve_e0"]
    s = res["run_0"]
    assert s["fci_energy"] < e0 < s["hf_energy"]


@pytest.mark.slow
def test_terms_cache_fingerprint_guard(tmp_path):
    """A cached terms file whose fingerprint does not match the molecule
    (pre-keyfix collision, or hand-copied cache) must be recompiled, not
    silently loaded (observed failure: seeds_N2 trained against the
    carleo/N2 Hamiltonian via a stale basename-keyed cache)."""
    import numpy as np

    r = _run_cli(["-m", "H2", "-n_train", "5", "-s", "3", "-loadH",
                  "-overwriteH", "-o", str(tmp_path / "a")], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    cache = tmp_path / "data" / "terms_cache" / "H2_terms.npz"
    assert cache.exists()
    z = dict(np.load(cache))
    assert "fingerprint" in z
    z["fingerprint"] = np.float64(-99.0)
    np.savez(cache, **z)
    r = _run_cli(["-m", "H2", "-n_train", "5", "-s", "3", "-loadH",
                  "-o", str(tmp_path / "b")], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "fingerprint mismatch" in r.stdout


@pytest.mark.slow
def test_ws_full_basis_and_resume_reports_subspace_ci(tmp_path):
    """-ws_full_basis re-targets against the full-basis ground state and
    the final summary reports that eigensolve as VMC+FCI — including after
    a resume, via the checkpointed ws_result (a watchdog-killed Li2O run
    must not silently fall back to the counter top-k)."""
    import json

    out = tmp_path / "run"
    r = _run_cli(["-m", "H2", "-n_train", "80", "-s", "3", "-ws_solve_h",
                  "40", "-ws_full_basis", "-save_freq", "20",
                  "-o", str(out)], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    ckpt = json.load(open(out / "checkpoint.json"))
    assert ckpt["ws_result"] is not None
    s1 = json.load(open(out / "summary.json"))
    assert s1["n_unique_final"] == 4  # H2 restricted basis
    # resume past the warm-start step: ws must NOT re-run, yet the summary
    # still carries the full-basis eigensolve
    r = _run_cli(["-m", "H2", "-n_train", "120", "-s", "3", "-ws_solve_h",
                  "40", "-ws_full_basis", "-o", str(out), "-c"], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    s2 = json.load(open(out / "summary.json"))
    assert s2["n_unique_final"] == 4
    assert abs(s2["e_vmc_fci_subspace"] - s1["e_vmc_fci_subspace"]) < 1e-12
    assert abs(s2["e_vmc_fci_subspace"] - s2["fci_energy"]) < 1e-8


@pytest.mark.slow
def test_cross_space_warm_start(tmp_path):
    """The production-window protocol (fleet phase "pw") loads a model
    trained in an n_excitations_max-restricted space into a FULL-space
    sampled trainer: a state supported on the restricted space has
    <psi|H|psi> = <psi|P H P|psi>, so the exact-mode energy must transfer
    and the sampled polish must start from it (not from a wiped/pretrained
    model)."""
    stage1 = tmp_path / "x4"
    r = _run_cli(
        ["-m", "LiH", "-n_train", "400", "-exact_sampling",
         "-n_excitations_max", "2", "-n_hid", "16", "-s", "5",
         "-output_freq", "200", "-o", str(stage1)],
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    s1 = json.load(open(stage1 / "summary.json"))
    # deep in the HF basin (a fresh random model sits ~2.4 Ha higher)
    assert s1["e_exact_final"] < s1["hf_energy"] + 4e-2

    stage2 = tmp_path / "pw"
    r = _run_cli(
        ["-m", "LiH", "-n_train", "500", "-n_samps", "100000",
         "-n_unq_samps_min", "16", "-n_unq_samps_max", "512",
         "-n_hid", "16", "-s", "5", "-n_pretrain", "20",
         "-output_freq", "100", "-l", str(stage1), "-o", str(stage2)],
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    s2 = json.load(open(stage2 / "summary.json"))
    # the full-space sampled run must inherit the stage-1 distribution
    # (a -l warm start skips pre-flatten/HF pretraining, which would wipe
    # it back to near-uniform ~2.4 Ha above, and must NOT try to restore
    # the source optimizer state — the optax chains differ) AND clean up
    # the off-restricted-space amplitude exact-mode training never saw:
    # measured, E_loc starts ~0.5 Ha high on the junk mass, crosses the
    # stage-1 restricted floor by ~step 300 and keeps descending toward
    # full FCI (the full H's gradient now sees n_exc>2 states)
    assert s2["e_loc_trailing_mean"] < s1["e_exact_final"] + 5e-3
