"""Device local-energy engine: E_loc(s) = sum_s' H_{ss'} psi(s')/psi(s).

The TPU-native replacement for the reference's incrementally-assembled SciPy
CSR Hamiltonian + Cython sparse mat-vec (reference: src/optimizer/
hamiltonian.py:272-370, src_cpp/sparse_math.pyx:49, src_cpp/
hamiltonian_math.pyx:200). No sparse matrix is ever materialized: coupled
states are `s XOR flip_mask`, signs are popcount parities, and psi(s') is a
binary-search membership lookup into the sorted sampled set (psi = 0 for
unsampled states — same truncation semantics as the reference,
energy.py:247-248).

Precision design: the diagonal (which carries ~|E| ~ 1e2-1e3 Ha and large
cancellations over Z-string terms) accumulates in f64 on the VPU; the
off-diagonal part (~0.1 Ha of correlation physics with small per-term
magnitudes) runs in f32. Final expectation reductions are f64.

All shapes are static: states arrive in a fixed-capacity buffer, sorted
ascending, padded with SENTINEL (all-ones) beyond `n_valid`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from naqs_tpu.hamiltonian import PauliTerms
from naqs_tpu.utils.bits import parity_pm1

# target elements per (chunk x term) intermediate; bounds peak memory
_CHUNK_BUDGET = 1 << 24


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DeviceTerms:
    """PauliTerms uploaded to device memory (a pytree of jnp arrays)."""

    diag_yz: jnp.ndarray     # (Kd,) uint64
    diag_coeff: jnp.ndarray  # (Kd,) float64
    xy_unique: jnp.ndarray   # (Kxy,) uint64
    yz_unique: jnp.ndarray   # (Kyz,) uint64
    gxy: jnp.ndarray         # (K,) int32
    gyz: jnp.ndarray         # (K,) int32
    coeff: jnp.ndarray       # (K,) float32

    def tree_flatten(self):
        return (
            (self.diag_yz, self.diag_coeff, self.xy_unique, self.yz_unique,
             self.gxy, self.gyz, self.coeff),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @staticmethod
    def from_terms(terms: PauliTerms) -> "DeviceTerms":
        return DeviceTerms(
            diag_yz=jnp.asarray(terms.diag_yz, dtype=jnp.uint64),
            diag_coeff=jnp.asarray(terms.diag_coeff, dtype=jnp.float64),
            xy_unique=jnp.asarray(terms.xy_unique, dtype=jnp.uint64),
            yz_unique=jnp.asarray(terms.yz_unique, dtype=jnp.uint64),
            gxy=jnp.asarray(terms.gxy, dtype=jnp.int32),
            gyz=jnp.asarray(terms.gyz, dtype=jnp.int32),
            coeff=jnp.asarray(terms.coeff, dtype=jnp.float32),
        )


def _chunk_rows(n_terms: int) -> int:
    c = max(64, _CHUNK_BUDGET // max(n_terms, 1))
    return 1 << int(math.floor(math.log2(c)))


def diagonal_energy(dt: DeviceTerms, states: jnp.ndarray) -> jnp.ndarray:
    """<s|H|s> in f64 for packed states (any shape)."""
    par = parity_pm1(states[..., None] & dt.diag_yz).astype(jnp.float64)
    return jnp.sum(par * dt.diag_coeff, axis=-1)


def _local_energy_chunk(
    dt: DeviceTerms,
    s: jnp.ndarray,          # (C,) uint64 chunk of sampled states
    states: jnp.ndarray,     # (U,) uint64 full sorted sample buffer
    log_amp: jnp.ndarray,    # (U,) f32
    phase: jnp.ndarray,      # (U,) f32
    my_log_amp: jnp.ndarray,  # (C,) f32 log-amplitudes of this chunk
    my_phase: jnp.ndarray,   # (C,) f32
    n_valid: jnp.ndarray,    # () int32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    # --- diagonal, f64
    e_diag = diagonal_energy(dt, s)

    # --- psi-ratio matrix over unique flip masks, f32/c64
    coupled = s[:, None] ^ dt.xy_unique[None, :]            # (C, Kxy)
    pos = jnp.searchsorted(states, coupled)
    pos_c = jnp.minimum(pos, states.shape[0] - 1)
    found = (states[pos_c] == coupled) & (pos < n_valid)
    # clip the log-ratio: psi'/psi beyond e^30 only occurs for states with
    # negligible sampling weight, and unclipped it overflows f32.
    dlog = jnp.clip(log_amp[pos_c] - my_log_amp[:, None], -30.0, 30.0)
    dph = phase[pos_c] - my_phase[:, None]
    mag = jnp.where(found, jnp.exp(dlog), 0.0).astype(jnp.float32)
    r_re = mag * jnp.cos(dph).astype(jnp.float32)
    r_im = mag * jnp.sin(dph).astype(jnp.float32)

    # --- sign matrix over unique sign masks, f32
    par = parity_pm1(s[:, None] & dt.yz_unique[None, :]).astype(jnp.float32)

    # --- per-term accumulation: e_off = sum_k c_k * P[:, gyz_k] * R[:, gxy_k]
    pg = par[:, dt.gyz]                                      # (C, K)
    e_re = jnp.einsum("ck,k->c", pg * r_re[:, dt.gxy], dt.coeff)
    e_im = jnp.einsum("ck,k->c", pg * r_im[:, dt.gxy], dt.coeff)

    return e_diag + e_re.astype(jnp.float64), e_im.astype(jnp.float64)


def local_energy(
    dt: DeviceTerms,
    states: jnp.ndarray,
    log_amp: jnp.ndarray,
    phase: jnp.ndarray,
    n_valid: jnp.ndarray,
    chunk_rows: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Local energies (re, im) f64 for a sorted, SENTINEL-padded state buffer.

    Rows beyond n_valid produce garbage values; callers mask by weight.
    """
    u = states.shape[0]
    c = chunk_rows or _chunk_rows(int(dt.gxy.shape[0]))
    c = min(c, u)
    n_chunks = -(-u // c)
    pad = n_chunks * c - u
    s_p = jnp.pad(states, (0, pad), constant_values=np.uint64(2**64 - 1))
    la_p = jnp.pad(log_amp, (0, pad))
    ph_p = jnp.pad(phase, (0, pad))

    def body(args):
        s, la, ph = args
        return _local_energy_chunk(dt, s, states, log_amp, phase, la, ph, n_valid)

    e_re, e_im = jax.lax.map(
        body,
        (
            s_p.reshape(n_chunks, c),
            la_p.reshape(n_chunks, c),
            ph_p.reshape(n_chunks, c),
        ),
    )
    return e_re.reshape(-1)[:u], e_im.reshape(-1)[:u]


def _quadratic_energy_chunk(
    dt: DeviceTerms,
    s: jnp.ndarray,
    states: jnp.ndarray,
    log_amp: jnp.ndarray,   # (U,) f32, already shifted so max == 0
    phase: jnp.ndarray,
    my_log_amp: jnp.ndarray,
    my_phase: jnp.ndarray,
    n_valid: jnp.ndarray,
    my_live: jnp.ndarray,   # (C,) bool
):
    """sum_{m in chunk, k} psi_m H_{mk} psi_k, in the symmetric product form
    exp(la_m + la_k) * cos/sin(ph_k - ph_m): every factor <= 1, so this is
    overflow-free for arbitrary amplitude dynamic range (unlike ratios)."""
    w_m = jnp.where(my_live, jnp.exp(2.0 * my_log_amp.astype(jnp.float64)), 0.0)
    e_diag = diagonal_energy(dt, s)
    num_diag = jnp.sum(w_m * e_diag)

    coupled = s[:, None] ^ dt.xy_unique[None, :]
    pos = jnp.searchsorted(states, coupled)
    pos_c = jnp.minimum(pos, states.shape[0] - 1)
    found = (states[pos_c] == coupled) & (pos < n_valid) & my_live[:, None]
    amp_prod = jnp.where(
        found, jnp.exp(log_amp[pos_c] + my_log_amp[:, None]), 0.0
    ).astype(jnp.float32)
    dph = phase[pos_c] - my_phase[:, None]
    r_re = amp_prod * jnp.cos(dph).astype(jnp.float32)

    par = parity_pm1(s[:, None] & dt.yz_unique[None, :]).astype(jnp.float32)
    pg = par[:, dt.gyz]
    num_off = jnp.einsum("ck,k->c", pg * r_re[:, dt.gxy], dt.coeff)
    return num_diag + jnp.sum(num_off.astype(jnp.float64)), jnp.sum(w_m)


@partial(jax.jit, static_argnames=("chunk_rows",))
def quadratic_energy(
    dt: DeviceTerms,
    states: jnp.ndarray,
    log_amp: jnp.ndarray,
    phase: jnp.ndarray,
    n_valid: jnp.ndarray,
    chunk_rows: int | None = None,
):
    """Exact <psi|H|psi> / <psi|psi> over a sorted state buffer.

    Overflow-safe for arbitrary (even untrained) amplitude ranges; use this
    for the exact-energy evaluation metric. The imaginary part cancels by
    Hermiticity and is not computed.
    """
    u = states.shape[0]
    live = jnp.arange(u) < n_valid
    la = jnp.where(live, log_amp, -jnp.inf)
    ref = jnp.max(la)
    la = jnp.where(live, log_amp - ref, -100.0)

    c = chunk_rows or _chunk_rows(int(dt.gxy.shape[0]))
    c = min(c, u)
    n_chunks = -(-u // c)
    pad = n_chunks * c - u
    s_p = jnp.pad(states, (0, pad), constant_values=np.uint64(2**64 - 1))
    la_p = jnp.pad(la, (0, pad), constant_values=-100.0)
    ph_p = jnp.pad(phase, (0, pad))
    live_p = jnp.pad(live, (0, pad))

    def body(args):
        s, l, p, lv = args
        return _quadratic_energy_chunk(dt, s, states, la, phase, l, p, n_valid, lv)

    num, den = jax.lax.map(
        body,
        (
            s_p.reshape(n_chunks, c),
            la_p.reshape(n_chunks, c),
            ph_p.reshape(n_chunks, c),
            live_p.reshape(n_chunks, c),
        ),
    )
    return jnp.sum(num) / jnp.sum(den)


@partial(jax.jit, static_argnames=("chunk_rows",))
def expectation_energy(
    dt: DeviceTerms,
    states: jnp.ndarray,
    log_amp: jnp.ndarray,
    phase: jnp.ndarray,
    weights: jnp.ndarray,
    n_valid: jnp.ndarray,
    chunk_rows: int | None = None,
):
    """Weighted <E_loc> and per-state E_loc. weights must sum to 1 (f64).

    With `states` = the full restricted basis and weights = normalized
    |psi|^2 this is the exact <psi|H|psi>/<psi|psi> (reference's
    calculate_energy, energy.py:189-217).
    """
    e_re, e_im = local_energy(dt, states, log_amp, phase, n_valid, chunk_rows)
    e_re = jnp.where(jnp.arange(states.shape[0]) < n_valid, e_re, 0.0)
    e_im = jnp.where(jnp.arange(states.shape[0]) < n_valid, e_im, 0.0)
    e_mean = jnp.sum(weights * e_re)
    e_var = jnp.sum(weights * (e_re - e_mean) ** 2)
    return e_mean, e_var, (e_re, e_im)
