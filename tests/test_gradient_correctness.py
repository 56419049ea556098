"""The VMC surrogate gradient equals the true energy gradient.

With exact |psi|^2 weights over the full basis, the surrogate loss
2 Re <conj(dlogpsi) (E_loc - <E>)> is constructed to have the same gradient
as d<E>/dtheta. We verify against direct autodiff through the (smooth,
overflow-safe) quadratic Rayleigh quotient.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

import naqs_tpu as nq
from naqs_tpu.models.nade import NAQSConfig, init_params, log_psi
from naqs_tpu.ops.local_energy import DeviceTerms, local_energy, quadratic_energy


@pytest.mark.slow
def test_surrogate_gradient_matches_autodiff_energy_gradient():
    mol = nq.load_molecule("LiH")
    h = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)
    dt = DeviceTerms.from_terms(terms)
    cfg = NAQSConfig(n_qubits=mol.n_qubits, sectors=h.sectors,
                     amp_hidden=(8,), phase_hidden=(8,), masking="full")
    # small weights: moderate amplitude dynamic range (random init spans
    # e^+-20 psi ratios where f32 E_loc noise dominates the comparison)
    params = jax.tree_util.tree_map(
        lambda x: 0.2 * x, init_params(jax.random.key(0), cfg)
    )
    basis = jnp.asarray(h.basis)
    n = jnp.int32(h.size)

    # direct: d/dtheta of the exact Rayleigh quotient
    def energy(p):
        la, ph = log_psi(cfg, p, basis)
        return quadratic_energy(dt, basis, la, ph, n)

    g_direct = jax.grad(energy)(params)

    # surrogate: exact-weight VMC estimator gradient
    def surrogate(p):
        la, ph = log_psi(cfg, p, basis)
        la_d, ph_d = jax.lax.stop_gradient((la, ph))
        w = jnp.exp(2.0 * la_d.astype(jnp.float64))
        w = w / jnp.sum(w)
        e_re, e_im = local_energy(dt, basis, la_d, ph_d, n)
        d_re = jax.lax.stop_gradient(e_re - jnp.sum(w * e_re))
        d_im = jax.lax.stop_gradient(e_im - jnp.sum(w * e_im))
        return 2.0 * jnp.sum(w * (la.astype(jnp.float64) * d_re
                                  + ph.astype(jnp.float64) * d_im))

    g_sur = jax.grad(surrogate)(params)

    v1, _ = ravel_pytree(g_direct)
    v2, _ = ravel_pytree(g_sur)
    v1, v2 = np.asarray(v1, dtype=np.float64), np.asarray(v2, dtype=np.float64)
    denom = np.linalg.norm(v1)
    assert denom > 1e-8
    rel = np.linalg.norm(v1 - v2) / denom
    assert rel < 5e-3, rel
    # cosine similarity essentially 1
    cos = float(v1 @ v2 / (np.linalg.norm(v1) * np.linalg.norm(v2)))
    assert cos > 0.99999, cos
