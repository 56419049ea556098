"""Arithmetic restricted-basis addressing via combinadic (colex) ranking.

The reference maps full-space states to restricted-basis indices through a
dense 2^N lookup table (reference: src/utils/hilbert.py:429-439). The sort
based membership search this engine used before is TPU-hostile: a
searchsorted over M*Kxy coupled queries costs ~107 ms per 6.5M lookups on a
v5e (measured), dominated by the co-sort.

This module replaces both with pure arithmetic: the index of a packed state
inside its (n_alpha, n_beta) electron-number sector is

    idx(s) = offset[n_a(s)] + colex(alpha bits of s) * C(S, n_b) + colex(beta bits)

where colex is the colexicographic combination rank
``sum_i C(p_i, i+1)`` over the i-th lowest set bit p_i, computed with an
unrolled O(n_qubits) loop of VPU compare/multiply ops (all binomials are
trace-time Python constants -- no tables, no gathers, no sorts). Membership
lookups then become direct row gathers into a dense |basis|-sized value
table, the one indexed op XLA runs fast (~0.34G rows/s measured vs 0.06G
lookups/s for searchsorted).

Supported whenever n_qubits <= 32 and the restricted space fits a dense f32
value table (|basis| <= RANK_SIZE_MAX, covering every shipped molecule except
the 56-qubit H2 cc-pVTZ); callers fall back to the sort-based engine
otherwise.
"""

from __future__ import annotations

from dataclasses import dataclass
from math import comb
from typing import Tuple

import jax.numpy as jnp
import numpy as np

# dense (|basis|+1, 2) f32 value table cap: 2 * 4 B * 2^26 = 537 MB HBM.
# Override with NAQS_TPU_RANK_MAX (e.g. to force the sort-based fallback
# engine on spaces whose giant fused programs upset a given compiler).
import os as _os

RANK_SIZE_MAX = int(_os.environ.get("NAQS_TPU_RANK_MAX", 1 << 26))

_MISS = -1.0e30         # log-amp stored in empty / sentinel slots
_MISS_THRESHOLD = -1.0e29


@dataclass(frozen=True)
class RankSpec:
    """Static (hashable) description of a multi-sector restricted space.

    All fields are Python ints/tuples so a RankSpec can ride in the aux_data
    of a pytree (DeviceTerms) and act as a jit static argument.

    offset/stride/expected_nb are indexed by n_alpha in [0, n_shells]:
      * offset[na]: start of the (na, nb) sector block in the dense table
      * stride[na]: C(n_shells, nb) (the beta-rank stride inside the block)
      * expected_nb[na]: the nb paired with this na, or -1 if no such sector
    """

    n_qubits: int
    n_shells: int
    size: int
    offset: Tuple[int, ...]
    stride: Tuple[int, ...]
    expected_nb: Tuple[int, ...]

    @staticmethod
    def for_hilbert(hilbert) -> "RankSpec | None":
        """Build a RankSpec for a Hilbert space, or None if unsupported."""
        s = hilbert.n_shells
        # the address space is the UNFILTERED sector product (an n_exc_max
        # filter leaves holes in the dense table, which is still correct)
        if hilbert.n_qubits > 32 or hilbert.sector_size > RANK_SIZE_MAX:
            return None
        nas = [na for (na, _) in hilbert.sectors]
        if len(set(nas)) != len(nas):
            return None  # duplicate n_alpha across sectors: ambiguous paging
        offset = [0] * (s + 1)
        stride = [0] * (s + 1)
        expected_nb = [-1] * (s + 1)
        pos = 0
        for (na, nb) in hilbert.sectors:
            offset[na] = pos
            stride[na] = comb(s, nb)
            expected_nb[na] = nb
            pos += comb(s, na) * comb(s, nb)
        assert pos == hilbert.sector_size
        return RankSpec(
            n_qubits=hilbert.n_qubits,
            n_shells=s,
            size=hilbert.sector_size,
            offset=tuple(offset),
            stride=tuple(stride),
            expected_nb=tuple(expected_nb),
        )


def rank_index(spec: RankSpec, states: jnp.ndarray) -> jnp.ndarray:
    """Dense-table index (int32) of packed states; spec.size for invalid.

    `states` may be uint64/uint32/int32 of any shape; only the low
    spec.n_qubits bits are read. Invalid states (electron counts matching no
    sector) map to the sentinel slot spec.size. All control flow unrolls at
    trace time; the computation is pure VPU element-wise int32 work.
    """
    s = spec.n_shells
    x = states.astype(jnp.uint32)
    k_a = max((i for i, nb in enumerate(spec.expected_nb) if nb >= 0), default=0)
    k_b = max((nb for nb in spec.expected_nb if nb >= 0), default=0)

    zero = jnp.zeros(x.shape, jnp.int32)
    c_a, c_b, r_a, r_b = zero, zero, zero, zero
    for j in range(s):
        b_a = ((x >> np.uint32(2 * j)) & np.uint32(1)).astype(jnp.int32)
        b_b = ((x >> np.uint32(2 * j + 1)) & np.uint32(1)).astype(jnp.int32)
        c_a = c_a + b_a
        c_b = c_b + b_b
        # colex contribution C(j, c) -- binomials are trace-time constants
        acc_a = zero
        for m in range(1, min(j, k_a) + 1):
            acc_a = acc_a + jnp.where(c_a == m, np.int32(comb(j, m)), 0)
        acc_b = zero
        for m in range(1, min(j, k_b) + 1):
            acc_b = acc_b + jnp.where(c_b == m, np.int32(comb(j, m)), 0)
        r_a = r_a + b_a * acc_a
        r_b = r_b + b_b * acc_b

    offset = jnp.full(x.shape, -1, jnp.int32)
    stride = zero
    exp_nb = jnp.full(x.shape, -1, jnp.int32)
    for na, nb in enumerate(spec.expected_nb):
        if nb < 0:
            continue
        hit = c_a == na
        offset = jnp.where(hit, np.int32(spec.offset[na]), offset)
        stride = jnp.where(hit, np.int32(spec.stride[na]), stride)
        exp_nb = jnp.where(hit, np.int32(nb), exp_nb)

    valid = (offset >= 0) & (exp_nb == c_b)
    idx = offset + r_a * stride + r_b
    return jnp.where(valid, idx, np.int32(spec.size))


def np_rank_index(spec: RankSpec, states: np.ndarray) -> np.ndarray:
    """Host oracle for rank_index (same semantics, numpy)."""
    states = np.asarray(states, dtype=np.uint64)
    s = spec.n_shells
    c_a = np.zeros(states.shape, np.int64)
    c_b = np.zeros(states.shape, np.int64)
    r_a = np.zeros(states.shape, np.int64)
    r_b = np.zeros(states.shape, np.int64)
    for j in range(s):
        b_a = ((states >> np.uint64(2 * j)) & np.uint64(1)).astype(np.int64)
        b_b = ((states >> np.uint64(2 * j + 1)) & np.uint64(1)).astype(np.int64)
        c_a += b_a
        c_b += b_b
        binom_a = np.array([comb(j, m) if m <= j else 0
                            for m in range(s + 2)], np.int64)
        r_a += b_a * binom_a[c_a]
        r_b += b_b * binom_a[c_b]
    off = np.asarray(spec.offset + (0,), np.int64)[np.minimum(c_a, s)]
    stride = np.asarray(spec.stride + (0,), np.int64)[np.minimum(c_a, s)]
    exp_nb = np.asarray(spec.expected_nb + (-1,), np.int64)[np.minimum(c_a, s)]
    valid = (exp_nb >= 0) & (exp_nb == c_b)
    idx = off + r_a * stride + r_b
    return np.where(valid, idx, spec.size).astype(np.int64)


def build_value_table(
    spec: RankSpec,
    states: jnp.ndarray,
    log_amp: jnp.ndarray,
    phase: jnp.ndarray,
    n_valid,
    miss_log_amp: float = _MISS,
) -> jnp.ndarray:
    """Scatter sampled (log_amp, phase) into the dense rank-indexed table.

    Returns (size+1, 2) f32; empty slots and the sentinel slot hold
    (miss_log_amp, 0). Differentiable in log_amp/phase (plain scatter).
    """
    n = states.shape[0]
    idx = rank_index(spec, states)
    live = jnp.arange(n) < n_valid
    idx = jnp.where(live, idx, np.int32(spec.size))
    # the init MUST depend on a traced value: an all-constant
    # full().at[].set() folds into a |basis|-sized HLO literal at compile
    # time (verified: f32[41409226] constant folding), which a remote
    # compile service then materializes/ships — build it at runtime instead
    tz = (log_amp.ravel()[:1].astype(jnp.float32) * 0.0)[0]
    table = jnp.zeros((spec.size + 1, 2), jnp.float32) + tz
    table = table.at[:, 0].add(jnp.float32(miss_log_amp))
    vals = jnp.stack(
        [log_amp.astype(jnp.float32), phase.astype(jnp.float32)], axis=1
    )
    table = table.at[idx].set(vals)
    # padded rows all landed on the sentinel slot; restore its miss marker
    table = table.at[spec.size].set(
        jnp.asarray([miss_log_amp, 0.0], jnp.float32)
    )
    return table


def lookup(spec: RankSpec, table: jnp.ndarray, queries: jnp.ndarray):
    """(found, log_amp, phase) of packed query states via direct addressing."""
    idx = rank_index(spec, queries)
    g = table[idx]
    g_la = g[..., 0]
    g_ph = g[..., 1]
    return g_la > _MISS_THRESHOLD, g_la, g_ph
