"""Packed-bitstring utilities (uint64) for occupation-number states.

A state over N <= 64 spin-orbital qubits is one uint64; bit q is the
occupation of spin-orbital q in Jordan-Wigner order (even q = alpha spin of
spatial orbital q//2, odd q = beta). This replaces the reference's int8
state tensors + Cython popcount kernels (src_cpp/hamiltonian_math.pyx:291,
src_cpp/hilbert_math.pyx:12) with native XLA bit ops.

Both jnp (device) and np (host) variants are provided; the np variants are
the oracles used in tests and in host-side assembly (solve_H).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

UINT64 = jnp.uint64
NP_UINT64 = np.uint64
SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)  # padding value, sorts last


# ---------------------------------------------------------------- device ops

def popcount(x: jnp.ndarray) -> jnp.ndarray:
    """Number of set bits; returns int32."""
    return lax.population_count(x).astype(jnp.int32)


def parity_pm1(x: jnp.ndarray) -> jnp.ndarray:
    """(-1)**popcount(x) as int32 in {+1, -1}."""
    return 1 - 2 * (lax.population_count(x).astype(jnp.int32) & 1)


def bit_weights(n: int) -> jnp.ndarray:
    """[2^0, ..., 2^(n-1)] as uint64."""
    return jnp.uint64(1) << jnp.arange(n, dtype=jnp.uint64)


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """Pack trailing axis of {0,1} ints into uint64 (bit i = bits[..., i])."""
    n = bits.shape[-1]
    w = bit_weights(n)
    return jnp.sum(bits.astype(jnp.uint64) * w, axis=-1, dtype=jnp.uint64)


def unpack_bits(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """uint64 -> (..., n) int32 of {0,1} (bit i at position i)."""
    shifts = jnp.arange(n, dtype=jnp.uint64)
    return ((x[..., None] >> shifts) & jnp.uint64(1)).astype(jnp.int32)


def searchsorted_u64(sorted_arr: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """Positions of `queries` in ascending `sorted_arr` (left insertion)."""
    return jnp.searchsorted(sorted_arr, queries)


def lookup_u64(sorted_arr: jnp.ndarray, queries: jnp.ndarray, n_valid):
    """Membership lookup into a sorted, possibly padded uint64 array.

    Returns (pos, found): `pos` clipped to valid range, `found` bool where
    the query is present among the first `n_valid` entries.
    """
    pos = jnp.searchsorted(sorted_arr, queries)
    pos_c = jnp.minimum(pos, sorted_arr.shape[0] - 1)
    found = (sorted_arr[pos_c] == queries) & (pos < n_valid)
    return pos_c, found


# ------------------------------------------------------------------ host ops

def np_popcount(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.uint64)
    return np.bitwise_count(x).astype(np.int64)


def np_parity_pm1(x: np.ndarray) -> np.ndarray:
    return 1 - 2 * (np_popcount(x) & 1)


def np_pack_bits(bits: np.ndarray) -> np.ndarray:
    n = bits.shape[-1]
    w = np.uint64(1) << np.arange(n, dtype=np.uint64)
    return np.sum(bits.astype(np.uint64) * w, axis=-1, dtype=np.uint64)


def np_unpack_bits(x: np.ndarray, n: int) -> np.ndarray:
    x = np.asarray(x, dtype=np.uint64)
    shifts = np.arange(n, dtype=np.uint64)
    return ((x[..., None] >> shifts) & np.uint64(1)).astype(np.int64)
