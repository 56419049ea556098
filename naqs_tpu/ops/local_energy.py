"""Device local-energy engine: E_loc(s) = sum_s' H_{ss'} psi(s')/psi(s).

The TPU-native replacement for the reference's incrementally-assembled SciPy
CSR Hamiltonian + Cython sparse mat-vec (reference: src/optimizer/
hamiltonian.py:272-370, src_cpp/sparse_math.pyx:49, src_cpp/
hamiltonian_math.pyx:200). No sparse matrix is ever materialized: coupled
states are `s XOR flip_mask`, signs are popcount parities, and psi(s') is a
membership lookup into the sorted sampled set (psi = 0 for unsampled states —
same truncation semantics as the reference, energy.py:247-248).

TPU-specific design (measured on v5e; see git history for the profile):
  * PRIMARY lookup path (ops/rank.py): the restricted-sector index of each
    coupled state is computed arithmetically (combinadic colex rank, O(N)
    VPU ops) and psi values come from ONE dense row gather — no sort, no
    searchsorted (a searchsorted costs ~107 ms per 6.5M queries vs ~20 ms
    for the row gather). Active whenever DeviceTerms carries a RankSpec
    (n_qubits <= 32 and the space fits a dense value table);
  * FALLBACK lookup (wide spaces): sort-based searchsorted
    (`method='sort'`), one fused device sort of queries+table instead of a
    binary search whose per-level random gathers are ~3000x slower on TPU;
    the table is gathered ONCE as a packed int32 record [key_lo, key_hi,
    la_bits, ph_bits] — int32, not f32, because f32-bitcast keys get NaN-
    canonicalized in transit, corrupting them;
  * the per-term sign/coefficient accumulation is a single MXU matmul
    H = P @ A with P in {+-1}^(M x Kyz) and A[gyz[k], gxy[k]] += coeff[k],
    at Precision.HIGHEST (default bf16 passes cost ~1e-3 Ha errors);
    for very large Hamiltonians where dense A would blow HBM, a per-term
    gather fallback keeps memory O(K);
  * the diagonal (|E| ~ 1e2-1e3 Ha, heavy cancellation) accumulates in f64
    on the VPU; the off-diagonal correlation part runs in f32.

All shapes are static: states arrive in a fixed-capacity buffer, sorted
ascending, padded with SENTINEL (all-ones) beyond `n_valid`.
"""

from __future__ import annotations

import math
import os as _os
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from naqs_tpu.hamiltonian import PauliTerms
from naqs_tpu.ops import dyn_gather
from naqs_tpu.ops.rank import (
    _MISS,
    _MISS_THRESHOLD,
    RankSpec,
    build_value_table,
    lookup as rank_lookup,
    rank_index,
)
from naqs_tpu.utils.bits import parity_pm1

# target elements per (chunk x term) intermediate; bounds peak memory
_CHUNK_BUDGET = 1 << 25
# above this many dense A entries, fall back to the per-term gather path
_DENSE_A_MAX = 1 << 26


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DeviceTerms:
    """PauliTerms uploaded to device memory (a pytree of jnp arrays).

    `rank_spec` (static aux, optional) enables the sort-free combinadic
    addressing path of ops/rank.py for the psi membership lookups.
    """

    diag_yz: jnp.ndarray     # (Kd,) uint64
    diag_coeff: jnp.ndarray  # (Kd,) float64
    xy_unique: jnp.ndarray   # (Kxy,) uint64
    yz_unique: jnp.ndarray   # (Kyz,) uint64
    gxy: jnp.ndarray         # (K,) int32
    gyz: jnp.ndarray         # (K,) int32
    coeff: jnp.ndarray       # (K,) float32
    a_mat: jnp.ndarray | None  # (Kyz, Kxy) f32 dense coupling matrix, or None
    rank_spec: RankSpec | None = None
    dense: "object | None" = None  # DenseTerms (ops/dense_engine), or None

    def tree_flatten(self):
        return (
            (self.diag_yz, self.diag_coeff, self.xy_unique, self.yz_unique,
             self.gxy, self.gyz, self.coeff, self.a_mat, self.dense),
            self.rank_spec,
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves[:8], rank_spec=aux, dense=leaves[8])

    @staticmethod
    def from_terms(
        terms: PauliTerms,
        dense_a: bool | None = None,
        hilbert=None,
        pad_to: int = 256,
    ) -> "DeviceTerms":
        """Upload compiled terms, zero-padding every term axis to a multiple
        of `pad_to`.

        Padding buckets the compiled-program shapes so related Hamiltonians
        (e.g. the 11 N2-curve geometries) share one executable via the
        persistent compilation cache — a ~4-minute remote compile per
        geometry otherwise. Pad entries are exact no-ops: xy=0 couples the
        diagonal with coefficient 0, yz=0 has parity +1 and coefficient 0.
        """
        def pad(arr, n, fill=0):
            out = np.full((n,), fill, dtype=arr.dtype)
            out[: len(arr)] = arr
            return out

        up = lambda n: max(pad_to, -(-n // pad_to) * pad_to)
        kyz, kxy = up(len(terms.yz_unique)), up(len(terms.xy_unique))
        k, kd = up(len(terms.coeff)), up(len(terms.diag_yz))
        if dense_a is None:
            dense_a = kyz * kxy <= _DENSE_A_MAX
        a_mat = None
        if dense_a:
            a = np.zeros((kyz, kxy), dtype=np.float32)
            np.add.at(a, (terms.gyz, terms.gxy), terms.coeff)
            a_mat = jnp.asarray(a)
        rank_spec = RankSpec.for_hilbert(hilbert) if hilbert is not None else None
        dense = None
        if (rank_spec is not None
                and _os.environ.get("NAQS_TPU_DENSE", "1") != "0"):
            from naqs_tpu.ops.dense_engine import (
                DenseTerms, FactorTerms, FactorTermsXL)

            if DenseTerms.supported(terms, hilbert):
                dense = DenseTerms.build(terms, hilbert)
            elif FactorTerms.supported(terms, hilbert):
                dense = FactorTerms.build(terms, hilbert)
            elif FactorTermsXL.supported(terms, hilbert):
                # n_exc-filtered sectors beyond the FactorTerms caps: the
                # staircase program touches only the restricted cells
                # (Li2O CISDTQ: 644k cells vs a 41.4M full grid whose
                # FactorTerms r1t buffer would be 151 GB)
                dense = FactorTermsXL.build(terms, hilbert)
        return DeviceTerms(
            diag_yz=jnp.asarray(pad(terms.diag_yz, kd), dtype=jnp.uint64),
            diag_coeff=jnp.asarray(pad(terms.diag_coeff, kd), dtype=jnp.float64),
            xy_unique=jnp.asarray(pad(terms.xy_unique, kxy), dtype=jnp.uint64),
            yz_unique=jnp.asarray(pad(terms.yz_unique, kyz), dtype=jnp.uint64),
            gxy=jnp.asarray(pad(terms.gxy, k), dtype=jnp.int32),
            gyz=jnp.asarray(pad(terms.gyz, k), dtype=jnp.int32),
            coeff=jnp.asarray(pad(terms.coeff, k), dtype=jnp.float32),
            a_mat=a_mat,
            rank_spec=rank_spec,
            dense=dense,
        )


def _chunk_rows(n_xy: int, n_yz: int) -> int:
    c = max(64, _CHUNK_BUDGET // max(6 * n_xy + n_yz, 1))
    return 1 << int(math.floor(math.log2(c)))


def diagonal_energy(dt: DeviceTerms, states: jnp.ndarray) -> jnp.ndarray:
    """<s|H|s> in f64 for packed states (any shape)."""
    par = parity_pm1(states[..., None] & dt.diag_yz).astype(jnp.float64)
    return jnp.sum(par * dt.diag_coeff, axis=-1)


def pack_table(states: jnp.ndarray, log_amp: jnp.ndarray, phase: jnp.ndarray):
    """(U, 4) int32 lookup records [key_lo, key_hi, la_bits, ph_bits]."""
    n = states.shape[0]
    return jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(states, jnp.int32).reshape(n, 2),
            jax.lax.bitcast_convert_type(log_amp.astype(jnp.float32), jnp.int32)[:, None],
            jax.lax.bitcast_convert_type(phase.astype(jnp.float32), jnp.int32)[:, None],
        ],
        axis=1,
    )


def _lookup(states, rec, n_valid, queries):
    """Membership lookup. Returns (found, la', ph') for each query."""
    n = states.shape[0]
    pos = jnp.searchsorted(states, queries.ravel(), method="sort").reshape(
        queries.shape
    )
    found_n = pos < n_valid
    pos = jnp.minimum(pos, n - 1)
    g = rec[pos]
    key = jax.lax.bitcast_convert_type(g[..., 0:2], jnp.uint64)
    found = (key == queries) & found_n
    g_la = jax.lax.bitcast_convert_type(g[..., 2], jnp.float32)
    g_ph = jax.lax.bitcast_convert_type(g[..., 3], jnp.float32)
    return found, g_la, g_ph


def _offdiag_h(dt: DeviceTerms, s: jnp.ndarray) -> jnp.ndarray:
    """(C, Kxy) f32 off-diagonal H row entries for chunk states s."""
    par = parity_pm1(s[:, None] & dt.yz_unique[None, :]).astype(jnp.float32)
    if dt.a_mat is not None:
        return jnp.dot(
            par, dt.a_mat,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    # memory-lean fallback: gather per term and segment-sum into xy groups
    contrib = par[:, dt.gyz] * dt.coeff
    return jax.ops.segment_sum(
        contrib.T, dt.gxy, num_segments=dt.xy_unique.shape[0]
    ).T


def _local_energy_chunk(
    dt: DeviceTerms,
    s: jnp.ndarray,          # (C,) uint64 chunk of sampled states
    states: jnp.ndarray,     # (U,) uint64 full sorted sample buffer
    rec: jnp.ndarray,        # (U, 4) int32 records, or (size+1, 2) rank table
    my_log_amp: jnp.ndarray,  # (C,) f32
    my_phase: jnp.ndarray,   # (C,) f32
    n_valid: jnp.ndarray,    # () int32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    e_diag = diagonal_energy(dt, s)

    coupled = s[:, None] ^ dt.xy_unique[None, :]            # (C, Kxy)
    if dt.rank_spec is not None and isinstance(rec, tuple):
        # Pallas path: rec = (la_tab, ph_tab) channel arrays, VMEM-resident
        # tile-sweep gather (dyn_gather) instead of the XLA row gather
        idx = rank_index(dt.rank_spec, coupled)
        g_la, g_ph = dyn_gather.table_gather2(rec[0], rec[1], idx)
        found = g_la > _MISS_THRESHOLD
    elif dt.rank_spec is not None:
        found, g_la, g_ph = rank_lookup(dt.rank_spec, rec, coupled)
    else:
        found, g_la, g_ph = _lookup(states, rec, n_valid, coupled)
    # clip the log-ratio: psi'/psi beyond e^30 only occurs for states with
    # negligible sampling weight, and unclipped it overflows f32.
    dlog = jnp.clip(g_la - my_log_amp[:, None], -30.0, 30.0)
    dph = g_ph - my_phase[:, None]
    mag = jnp.where(found, jnp.exp(dlog), 0.0).astype(jnp.float32)
    r_re = mag * jnp.cos(dph).astype(jnp.float32)
    r_im = mag * jnp.sin(dph).astype(jnp.float32)

    h = _offdiag_h(dt, s)                                    # (C, Kxy)
    e_re = jnp.sum(h * r_re, axis=-1).astype(jnp.float64)
    e_im = jnp.sum(h * r_im, axis=-1).astype(jnp.float64)
    return e_diag + e_re, e_im


def local_energy(
    dt: DeviceTerms,
    states: jnp.ndarray,
    log_amp: jnp.ndarray,
    phase: jnp.ndarray,
    n_valid: jnp.ndarray,
    chunk_rows: int | None = None,
    queries: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
    axis_name: str | None = None,
    axis_size: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Local energies (re, im) f64 for a sorted, SENTINEL-padded state buffer.

    Rows beyond n_valid produce garbage values; callers mask by weight.
    Dispatches to the dense sector-grid engine (ops/dense_engine) when the
    terms carry a DenseTerms program; the rank/sort membership engines
    below handle everything else.

    `queries=(q_states, q_la, q_ph)` computes E_loc only for those rows
    while psi(s') is still resolved against the full (states, log_amp,
    phase, n_valid) table — the multi-chip contract (SURVEY.md section
    2.3(d): each chip expands ITS OWN samples against the global sampled
    support). `axis_name`/`axis_size` (inside shard_map) additionally
    split the dense/factored engines' term-chunk scan across the mesh
    with a psum of the numerator grid, so per-chip engine FLOPs scale as
    1/D for those engines too (the membership engines already scale via
    the query split).
    """
    if dt.dense is not None:
        from naqs_tpu.ops.dense_engine import (
            FactorTerms, FactorTermsXL, dense_local_energy,
            factored_local_energy, factored_xl_local_energy)

        if isinstance(dt.dense, FactorTermsXL):
            # XL's per-cell diagonal table cannot cover in-sector states
            # OUTSIDE the n_exc staircase (a partial-mask sampler can emit
            # them); pass the diag terms so those rows get their true
            # diagonal instead of the sentinel 0 (which would bias a
            # count-weighted E_loc mean by ~|E| per unit leaked count)
            return factored_xl_local_energy(
                dt.dense, dt.rank_spec, states, log_amp, phase, n_valid,
                queries=queries, axis_name=axis_name, axis_size=axis_size,
                diag=(dt.diag_yz, dt.diag_coeff))
        impl = (factored_local_energy
                if isinstance(dt.dense, FactorTerms) else dense_local_energy)
        return impl(dt.dense, dt.rank_spec, states, log_amp, phase, n_valid,
                    queries=queries, axis_name=axis_name, axis_size=axis_size)
    q_states, q_la, q_ph = (states, log_amp, phase) if queries is None else queries
    u = q_states.shape[0]
    c = chunk_rows or _chunk_rows(int(dt.xy_unique.shape[0]), int(dt.yz_unique.shape[0]))
    c = min(c, u)
    n_chunks = -(-u // c)
    pad = n_chunks * c - u
    s_p = jnp.pad(q_states, (0, pad), constant_values=np.uint64(2**64 - 1))
    la_p = jnp.pad(q_la, (0, pad))
    ph_p = jnp.pad(q_ph, (0, pad))
    if dt.rank_spec is not None:
        rec = build_value_table(dt.rank_spec, states, log_amp, phase, n_valid)
        if dyn_gather.pallas_gather_enabled(dt.rank_spec.size + 1):
            rec = dyn_gather.pad_tables(
                rec, dt.rank_spec.size, tile_w=2048, miss=_MISS)
    else:
        rec = pack_table(states, log_amp, phase)

    def body(args):
        s, la, ph = args
        return _local_energy_chunk(dt, s, states, rec, la, ph, n_valid)

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
    la_all: jnp.ndarray,      # (U,) f32 shifted log-amps (differentiable)
    ph_all: jnp.ndarray,      # (U,) f32
    my_log_amp: jnp.ndarray,  # (C,) f32, shifted so global max == 0
    my_phase: jnp.ndarray,
    n_valid: jnp.ndarray,
    my_live: jnp.ndarray,     # (C,) bool
):
    """sum_{m in chunk, k} psi_m H_{mk} psi_k in the symmetric product form
    exp(la_m + la_k) * cos(ph_k - ph_m): every factor <= 1, so this is
    overflow-free for arbitrary amplitude dynamic range (unlike ratios).

    Unlike the training-path lookup (int32 record bitcasts, which are NOT
    differentiable), psi values are gathered from the float arrays directly
    so autodiff through this evaluator yields the true energy gradient.
    """
    w_m = jnp.where(my_live, jnp.exp(2.0 * my_log_amp.astype(jnp.float64)), 0.0)
    num_diag = jnp.sum(w_m * diagonal_energy(dt, s))

    coupled = s[:, None] ^ dt.xy_unique[None, :]
    if dt.rank_spec is not None:
        # la_all here is the differentiable (size+1, 2) rank value table.
        # Misses hold la = -200: exp(-200 + la') with la' <= 0 is < 1.4e-87,
        # far below the smallest f32 subnormal, so unsampled pairs contribute
        # exactly 0 regardless of FTZ behavior (-100 alone would leave a
        # representable ~3.7e-44 subnormal on CPU/XLA backends).
        idx = rank_index(dt.rank_spec, coupled)
        g = la_all[idx]
        g_la, g_ph = g[..., 0], g[..., 1]
        found = my_live[:, None]
    else:
        n = states.shape[0]
        pos = jnp.searchsorted(states, coupled.ravel(), method="sort").reshape(
            coupled.shape
        )
        found_n = pos < n_valid
        pos = jnp.minimum(pos, n - 1)
        found = (states[pos] == coupled) & found_n & my_live[:, None]
        g_la = la_all[pos]
        g_ph = ph_all[pos]
    amp_prod = jnp.where(found, jnp.exp(g_la + my_log_amp[:, None]), 0.0).astype(
        jnp.float32
    )
    r_re = amp_prod * jnp.cos(g_ph - my_phase[:, None]).astype(jnp.float32)

    h = _offdiag_h(dt, s)
    num_off = jnp.sum(h * r_re, axis=-1)
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
    la = jnp.where(live, log_amp - ref, -200.0)

    c = chunk_rows or _chunk_rows(int(dt.xy_unique.shape[0]), int(dt.yz_unique.shape[0]))
    c = min(c, u)
    n_chunks = -(-u // c)
    pad = n_chunks * c - u
    s_p = jnp.pad(states, (0, pad), constant_values=np.uint64(2**64 - 1))
    la_p = jnp.pad(la, (0, pad), constant_values=-200.0)
    ph_p = jnp.pad(phase, (0, pad))
    live_p = jnp.pad(live, (0, pad))

    if dt.rank_spec is not None:
        # differentiable dense value table; miss slots at la=-200 make the
        # symmetric product exp(la+la') underflow to exactly 0 in f32 even
        # with la'=0 and without relying on FTZ (e^-200 ~ 1.4e-87)
        table = build_value_table(
            dt.rank_spec, states, la, phase, n_valid, miss_log_amp=-200.0
        )
        la_arg, ph_arg = table, phase
    else:
        la_arg, ph_arg = la, phase

    def body(args):
        s, l, p, lv = args
        return _quadratic_energy_chunk(dt, s, states, la_arg, ph_arg, l, p, n_valid, lv)

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
    """Weighted <E_loc> and per-state E_loc. weights must sum to 1 (f64)."""
    e_re, e_im = local_energy(dt, states, log_amp, phase, n_valid, chunk_rows)
    e_re = jnp.where(jnp.arange(states.shape[0]) < n_valid, e_re, 0.0)
    e_im = jnp.where(jnp.arange(states.shape[0]) < n_valid, e_im, 0.0)
    e_mean = jnp.sum(weights * e_re)
    e_var = jnp.sum(weights * (e_re - e_mean) ** 2)
    return e_mean, e_var, (e_re, e_im)
