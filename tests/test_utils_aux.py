"""Aux subsystems: logging persistence, profiling helpers, basis rotations,
phase activations."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

import naqs_tpu as nq
from naqs_tpu.models.nade import NAQSConfig, init_params, log_psi
from naqs_tpu.trainer import TrainConfig, VMCTrainer
from naqs_tpu.utils.profiling import device_memory_stats, save_log
from naqs_tpu.utils.unitaries import rotate_state


def test_save_log_jsonl_and_pickle(tmp_path):
    log = {"E_LOC": [(1, -1.0), (2, -1.5)], "TIME": [(1, 0.1), (2, 0.2)], "E": []}
    path = save_log(log, str(tmp_path / "log"))
    lines = [json.loads(l) for l in open(path)]
    assert {l["key"] for l in lines} == {"E_LOC", "TIME"}
    import pandas as pd

    df = pd.read_pickle(tmp_path / "log.pkl")
    assert list(df["E_LOC"]) == [-1.0, -1.5]


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert len(stats) >= 1


def test_rotate_state_x_basis():
    # one X-rotated qubit: |0>_X = (|0> + |1>)/sqrt(2)
    states, amps = rotate_state(0b00, {0: "X"})
    np.testing.assert_array_equal(states, [0, 1])
    np.testing.assert_allclose(amps, [1 / np.sqrt(2)] * 2)
    # |1>_X = (|0> - |1>)/sqrt(2)
    states, amps = rotate_state(0b01, {0: "X"})
    np.testing.assert_allclose(amps, [1 / np.sqrt(2), -1 / np.sqrt(2)])
    # norm preserved with two rotated qubits in Y
    states, amps = rotate_state(0b10, {0: "Y", 1: "Y"})
    assert len(states) == 4
    np.testing.assert_allclose(np.sum(np.abs(amps) ** 2), 1.0)


def test_phase_activation_bounds():
    mol = nq.load_molecule("LiH", load_hamiltonian=False)
    h = nq.Hilbert.for_molecule(mol)
    for act in ["softsign", "tanh", "hardtanh", "sin", "sigmoid"]:
        cfg = NAQSConfig(
            n_qubits=mol.n_qubits, sectors=h.sectors, amp_hidden=(8,),
            phase_hidden=(8,), masking="full", aggregate_phase=True,
            phase_activation=act,
        )
        params = init_params(jax.random.key(0), cfg)
        _, ph = log_psi(cfg, params, jnp.asarray(h.basis[:32]))
        s = cfg.n_shells
        assert float(jnp.max(jnp.abs(ph))) <= np.pi * s + 1e-4
