"""Diagnose the h2o_631g_fs stall (~+13 mHa at step 3000).

Compares the stalled from-scratch model against (a) the cached CISDTQ
subspace eigenvector (149,661 states, E0 = -76.121260 = FCI + 0.178 mHa)
and (b) the warm-started production-window model pw7 (+1.283 mHa direct):

  - in-subspace probability mass of each model (models are normalized over
    the FULL 1.66M-state sector, so the subspace sum IS the mass)
  - overlaps |<model|vec>|^2 and |<fs|pw7>|^2, renormalized in-subspace
  - in-subspace Rayleigh quotient of each model (assembled sparse H)

CPU-only; reads committed checkpoints. Run: python scratch/probe_fs_stall.py
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

import naqs_tpu as nq  # noqa: E402  (x64 on)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from naqs_tpu.models.nade import NAQSConfig, log_psi  # noqa: E402

mol = nq.load_molecule("H2O_6-31G")
h_full = nq.Hilbert.for_molecule(mol, restrict_to_ms=True)
h4 = nq.Hilbert(n_qubits=mol.n_qubits, sectors=h_full.sectors, n_exc_max=4)
states = np.asarray(h4.basis)
print(f"CISDTQ subspace: {len(states)} states (expect 149661)")

terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits,
                               n_excitations_max=4)

# --- locate the cached eigenvector by recomputing the solve_h cache key
import hashlib

hh = hashlib.sha1(states.tobytes())
for arr in (terms.coeff, terms.xy_unique, terms.yz_unique, terms.gxy,
            terms.gyz, terms.diag_yz, terms.diag_coeff):
    hh.update(np.ascontiguousarray(arr).tobytes())
hh.update(np.float64(-1))
cache = os.path.join("data", "ws_cache", hh.hexdigest()[:16] + ".npz")
print("cache key:", cache, "exists:", os.path.exists(cache))
if not os.path.exists(cache):
    # key mismatch (terms provenance differs from the x5 chain's): the
    # 149,661-dim cached vector can only be the H2O 6-31G CISDTQ solve —
    # load it directly and VALIDATE by Rayleigh quotient against the H
    # assembled below (must reproduce its stored e0 to ~1e-9).
    cache = os.path.join("data", "ws_cache", "59df7f637c07d6ef.npz")
vec = e0 = None
if os.path.exists(cache):
    z = np.load(cache)
    e0, vec = float(z["e0"]), z["vec"]
    if len(vec) != len(states):
        print(f"eigenvector dim {len(vec)} != {len(states)}; skipping")
        vec = e0 = None
    else:
        print(f"eigenvector: E0={e0:.6f} "
              f"({(e0 - mol.fci_energy) * 1e3:+.3f} mHa)")


def load_model(run):
    import json

    from flax import serialization

    with open(f"data/fleet/{run}/args.json") as f:
        a = json.load(f)
    s = mol.n_qubits // 2
    cfg = NAQSConfig(
        n_qubits=mol.n_qubits,
        sectors=h_full.sectors,
        masking="full" if a["full_mask_psi"] else (
            "none" if a["no_mask_psi"] else "partial"),
        amp_hidden=(a["n_hid"],) * a["n_layer"],
        phase_hidden=(a["n_hid_phase"],) * a["n_layer_phase"],
        use_amp_spin_sym=not a["no_amp_sym"],
        use_phase_spin_sym=a["phase_sym"],
        aggregate_phase=not a["single_phase"],
        num_lut=a["n_lut"],
        combined_amp_phase=a["comb_amp_phase"],
        shell_order=tuple(range(s - 1, -1, -1)),
        input_encoding=a["input_encoding"],
    )
    from naqs_tpu.models.nade import init_params

    params0 = init_params(jax.random.key(0), cfg)
    with open(f"data/fleet/{run}/checkpoint.msgpack", "rb") as f:
        blob = serialization.from_bytes(
            {"params": params0, "opt_state": None}, f.read())
    return cfg, blob["params"]


@jax.jit
def fwd(cfg_static, params, s):
    return log_psi(cfg_static, params, s)


def psi_on(cfg, params, states_np, chunk=16384):
    out = []
    f = jax.jit(lambda p, s: log_psi(cfg, p, s))
    for i in range(0, len(states_np), chunk):
        la, ph = f(params, jnp.asarray(states_np[i:i + chunk]))
        out.append(np.exp(np.asarray(la)) * np.exp(1j * np.asarray(ph)))
    return np.concatenate(out)


report = {}
psis = {}
for run in ["h2o_631g_fs", "h2o_631g_pw7"]:
    cfg, params = load_model(run)
    psi = psi_on(cfg, params, states)
    psis[run] = psi
    mass = float(np.sum(np.abs(psi) ** 2))
    report[run] = {"in_subspace_mass": mass}
    if vec is not None:
        pn = psi / np.sqrt(mass)
        report[run]["overlap2_with_eigvec"] = float(
            np.abs(np.vdot(pn, vec)) ** 2)
    print(run, report[run], flush=True)

a = psis["h2o_631g_fs"] / np.linalg.norm(psis["h2o_631g_fs"])
b = psis["h2o_631g_pw7"] / np.linalg.norm(psis["h2o_631g_pw7"])
print("overlap^2(fs, pw7) in-subspace:", float(np.abs(np.vdot(a, b)) ** 2),
      flush=True)

# amplitude-only overlap isolates sign/phase error from |psi| error
if vec is not None:
    print("amp-only overlap^2(fs, eigvec):",
          float(np.abs(np.vdot(np.abs(a), np.abs(vec))) ** 2), flush=True)

from naqs_tpu.hamiltonian import assemble_sparse_hamiltonian_np  # noqa: E402

print("assembling in-subspace H...", flush=True)
H = assemble_sparse_hamiltonian_np(terms, states)
if vec is not None:
    e_vec = float(np.real(np.vdot(vec, H @ vec)))
    print(f"eigvec Rayleigh check: {e_vec:.9f} vs stored e0 {e0:.9f} "
          f"(match={abs(e_vec - e0) < 1e-6})", flush=True)
for run, psi in psis.items():
    pn = psi / np.linalg.norm(psi)
    e_sub = float(np.real(np.vdot(pn, H @ pn)))
    print(f"{run}: in-subspace Rayleigh = {e_sub:.6f} "
          f"({(e_sub - mol.fci_energy) * 1e3:+.3f} mHa vs FCI, "
          f"{(e_sub - e0) * 1e3 if e0 else float('nan'):+.3f} vs subspace E0)",
          flush=True)
