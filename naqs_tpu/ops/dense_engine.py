"""Dense sector-grid local-energy engine: gathers become static permutations.

The sampled-path engine (ops/local_energy.py) resolves psi(s ^ xy_k) with
one random row gather per (state, flip-mask) pair -- M*Kxy rows/call, and
XLA's TPU gather is issue-bound at ~0.32 G rows/s (the engine hot spot).

This module exploits the combinadic table layout (ops/rank.py): inside one
(n_alpha, n_beta) sector the dense index factors as

    idx(s) = rank_a(alpha(s)) * Sb + rank_b(beta(s)),      Sa x Sb grid

and a flip mask xy = (xa, xb) acts INDEPENDENTLY on the two factors:

    idx(s ^ xy) = pi_a[xa][ra] * Sb + pi_b[xb][rb]

where pi_a/pi_b are STATIC partial permutation maps (molecular JW
Hamiltonians conserve n_alpha and n_beta, so every coupled state lives in
the same sector; a mask that changes an electron count simply has no valid
image). The per-pair random gather therefore collapses into two structured
row-gather stages over the full sector grid:

    R1[ka]   = U[pi_a[ka], :]            (Ka*Sa rows)
    T[k, rb] = R1t_flat[row_map[k, rb]]  (Kxy*Sb rows)

~100k rows/call instead of M*Kxy ~ 3-7M -- a ~30-60x reduction in gather
issue cost. Everything else is static and precomputed once per molecule:
the per-mask Hamiltonian row values H_x(s) (a (Kxy, Sb, Sa) tensor; the
reference recomputes parities per batch, src_cpp/hamiltonian_math.pyx:200)
and the f64 diagonal <s|H|s>.

Values, not log-amps, ride the pipeline: U holds psi/max|psi| per grid
cell, so unsampled states and invalid images are plain zeros -- the
truncation semantics psi(unsampled)=0 (reference energy.py:247-248) with
no miss-markers or found-masks anywhere.

Applies when the space is single-sector and small enough to keep the
static H tensor in HBM (the sto-3g zoo, the N2/carleo suites); larger
spaces stay on the rank/sort engines.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from math import comb
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# dense-mode caps: sector grid cells and static H tensor bytes. 2^17 cells
# covers the whole closed-shell sto-3g zoo through LiCl (286^2 = 81,796);
# the H tensor for those tops out well under 1 GB of HBM.
DENSE_SIZE_MAX = int(os.environ.get("NAQS_TPU_DENSE_MAX", 1 << 17))
DENSE_H_BYTES_MAX = int(os.environ.get("NAQS_TPU_DENSE_H_MAX", 1 << 30))
# factored-mode caps: grid cells and the (Ka, Sa, Sb) alpha-permuted
# buffer bytes (see FactorTerms). 2^21 cells covers H2O 6-31G (1287^2 =
# 1.66M) and the water dimer (1001^2 = 1.00M).
FACT_SIZE_MAX = int(os.environ.get("NAQS_TPU_FACT_MAX", 1 << 21))
FACT_R1_BYTES_MAX = int(os.environ.get("NAQS_TPU_FACT_R1_MAX", 6 << 30))
# terms per accumulation chunk (bounds the (KC, Sb, Sa) intermediates)
_CHUNK_TERMS = 256
_FACT_CHUNK_PAIRS = 16
_FACT_R = 64  # rank-1 factors per flip mask (padded; molecular max ~54)


def _colex_ranks(s: int, n: int) -> Tuple[np.ndarray, np.ndarray]:
    """(packed_shellbits, colex_rank) for all C(s, n) combinations.

    Combinations are enumerated in the colex order of ops/rank.py:
    rank = sum_i C(p_i, i+1) over the i-th lowest set position p_i.
    """
    from itertools import combinations

    m = comb(s, n)
    packed = np.zeros((m,), np.int64)
    for pos in combinations(range(s), n):
        r = sum(comb(p, i + 1) for i, p in enumerate(pos))
        packed[r] = sum(1 << p for p in pos)
    return packed


def _perm_map(packed: np.ndarray, flip: int, invalid: int) -> np.ndarray:
    """rank -> rank of (combo ^ flip), or `invalid` if the count changes."""
    s_rank = {int(p): r for r, p in enumerate(packed)}
    out = np.full((len(packed),), invalid, np.int32)
    for r, p in enumerate(packed):
        q = int(p) ^ flip
        j = s_rank.get(q)
        if j is not None:
            out[r] = j
    return out


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DenseTerms:
    """Static dense-mode program for one (na, nb) sector."""

    r1_idx: jnp.ndarray    # (Ka, Sa) int32 into U rows [0, Sa]; Sa = pad row
    row_map: jnp.ndarray   # (Kxy_pad, Sb) int32 into R1t_flat rows
    h_dense: jnp.ndarray   # (Kxy_pad, Sb, Sa) f32  H_x(s) in [rb, ra] layout
    e_diag: jnp.ndarray    # (Sa*Sb + 1,) f64   <s|H|s>, 0 at the sentinel
    sa: int
    sb: int

    def tree_flatten(self):
        return ((self.r1_idx, self.row_map, self.h_dense, self.e_diag),
                (self.sa, self.sb))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, sa=aux[0], sb=aux[1])

    @staticmethod
    def supported(terms, hilbert) -> bool:
        if len(set(hilbert.sectors)) != 1:
            return False
        if hilbert.sector_size > DENSE_SIZE_MAX:
            return False
        (na, nb), = set(hilbert.sectors)
        s = hilbert.n_shells
        sa, sb = comb(s, na), comb(s, nb)
        kxy = len(terms.xy_unique)
        return kxy * sa * sb * 4 <= DENSE_H_BYTES_MAX

    @staticmethod
    def build(terms, hilbert) -> "DenseTerms":
        assert DenseTerms.supported(terms, hilbert)
        (na, nb), = set(hilbert.sectors)
        s = hilbert.n_shells

        alpha_packed = _colex_ranks(s, na)      # shell-bit packed, rank order
        beta_packed = _colex_ranks(s, nb)
        sa, sb = len(alpha_packed), len(beta_packed)

        # split each flip mask into shell-space alpha/beta parts
        xy = np.asarray(terms.xy_unique, dtype=np.uint64)
        xa = np.zeros(len(xy), np.int64)
        xb = np.zeros(len(xy), np.int64)
        for j in range(s):
            xa |= ((xy >> np.uint64(2 * j)) & 1).astype(np.int64) << j
            xb |= ((xy >> np.uint64(2 * j + 1)) & 1).astype(np.int64) << j
        ua, ga = np.unique(xa, return_inverse=True)
        ub, gb = np.unique(xb, return_inverse=True)

        r1_idx = np.stack(
            [_perm_map(alpha_packed, int(f), invalid=sa) for f in ua])
        pb_idx = np.stack(
            [_perm_map(beta_packed, int(f), invalid=sb) for f in ub])
        # combined second-stage map: R1 is (Ka, Sa, Sb+1); transposed and
        # flattened to (Ka*(Sb+1), Sa) rows indexed by [ka, rb']
        row_map = (ga[:, None] * (sb + 1) + pb_idx[gb]).astype(np.int32)

        # static H values H_x(s) over the full grid, [rb, ra] layout
        state_grid = (
            _expand_qubits(alpha_packed, 0, s)[None, :]
            | _expand_qubits(beta_packed, 1, s)[:, None]
        )  # (Sb, Sa) uint64
        h_dense = np.zeros((len(xy), sb, sa), np.float32)
        coeff = np.asarray(terms.coeff, np.float64)
        gxy = np.asarray(terms.gxy)
        yz = np.asarray(terms.yz_unique, np.uint64)[np.asarray(terms.gyz)]
        for j in range(len(coeff)):
            par = 1.0 - 2.0 * (
                np.bitwise_count(state_grid & yz[j]) & np.uint64(1)
            ).astype(np.float64)
            h_dense[gxy[j]] += (coeff[j] * par).astype(np.float32)

        e_diag = np.zeros((sa * sb + 1,), np.float64)
        dyz = np.asarray(terms.diag_yz, np.uint64)
        dco = np.asarray(terms.diag_coeff, np.float64)
        flat_grid = state_grid.T.reshape(-1)  # [ra, rb] flat = rank order
        for j in range(len(dco)):
            par = 1.0 - 2.0 * (
                np.bitwise_count(flat_grid & dyz[j]) & np.uint64(1)
            ).astype(np.float64)
            e_diag[:-1] += dco[j] * par

        # pad the term axis so related Hamiltonians share compiled shapes
        kxy = len(xy)
        kp = -(-kxy // _CHUNK_TERMS) * _CHUNK_TERMS
        if kp != kxy:
            row_map = np.concatenate(
                [row_map, np.zeros((kp - kxy, sb), np.int32)])
            h_dense = np.concatenate(
                [h_dense, np.zeros((kp - kxy, sb, sa), np.float32)])

        return DenseTerms(
            r1_idx=jnp.asarray(r1_idx),
            row_map=jnp.asarray(row_map),
            h_dense=jnp.asarray(h_dense),
            e_diag=jnp.asarray(e_diag),
            sa=sa, sb=sb,
        )


def _expand_qubits(shell_packed: np.ndarray, spin: int, s: int) -> np.ndarray:
    """Shell-space bit pattern -> full qubit-space uint64 (alpha=even bits)."""
    out = np.zeros(shell_packed.shape, np.uint64)
    for j in range(s):
        out |= ((shell_packed >> j) & 1).astype(np.uint64) << np.uint64(
            2 * j + spin)
    return out


def _shard_chunks(stacked, axis_name, axis_size):
    """Slice a tuple of (nc, ...) chunk-stacked scan inputs down to this
    shard's contiguous chunk range (zero-padding nc up to a multiple of
    axis_size; zero chunks are exact no-ops in both engines since their
    H values are zero)."""
    nc = stacked[0].shape[0]
    nc_pad = -(-nc // axis_size) * axis_size
    if nc_pad != nc:
        stacked = tuple(
            jnp.pad(a, ((0, nc_pad - nc),) + ((0, 0),) * (a.ndim - 1))
            for a in stacked)
    per = nc_pad // axis_size
    i0 = jax.lax.axis_index(axis_name) * per
    return tuple(jax.lax.dynamic_slice_in_dim(a, i0, per, axis=0)
                 for a in stacked)


def dense_local_energy(
    dn: DenseTerms,
    rank_spec,
    states: jnp.ndarray,    # (U,) uint64 sorted SENTINEL-padded buffer
    log_amp: jnp.ndarray,   # (U,) f32
    phase: jnp.ndarray,     # (U,) f32
    n_valid: jnp.ndarray,   # () int32
    queries=None,
    axis_name: str | None = None,
    axis_size: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """E_loc (re, im) f64 rows for the sampled buffer, dense-grid algorithm.

    Semantics match ops/local_energy.local_energy: psi = 0 outside the
    sampled set, rows past n_valid are garbage, and amplitude ratios beyond
    e^30 are clipped (here per row rather than per pair: states that far
    below the peak carry negligible sampling weight either way).

    `queries=(q_states, q_la, q_ph)` restricts the numerator READOUT to
    those rows (the grid itself is built from the full table — its cost is
    sample-count independent). Under `axis_name`, the term-chunk scan is
    split across the mesh and the numerator grid psum'd, so per-chip FLOPs
    are ~Kxy/D * grid.
    """
    from naqs_tpu.ops.rank import rank_index

    q_states, q_la, q_ph = (states, log_amp, phase) if queries is None else queries
    sa, sb = dn.sa, dn.sb
    u = states.shape[0]
    live = jnp.arange(u) < n_valid
    la = jnp.where(live, log_amp, -jnp.inf)
    ref = jnp.max(la)
    w = jnp.where(live, jnp.exp(log_amp - ref), 0.0).astype(jnp.float32)
    u_re = w * jnp.cos(phase).astype(jnp.float32)
    u_im = w * jnp.sin(phase).astype(jnp.float32)

    idx_t = rank_index(rank_spec, states)          # [0, sa*sb], sentinel incl
    ra_t = jnp.minimum(idx_t // sb, sa)            # sentinel -> pad row
    rb_t = jnp.where(idx_t >= sa * sb, 0, idx_t % sb)

    # channel grid with zero pad row/column; pad rows scatter zeros
    grid = jnp.zeros((sa + 1, sb + 1, 2), jnp.float32)
    grid = grid.at[ra_t, rb_t].set(jnp.stack([u_re, u_im], axis=-1), mode="drop")

    r1 = grid[dn.r1_idx]                           # (Ka, Sa, Sb+1, 2)
    r1t = jnp.swapaxes(r1, 1, 2).reshape(-1, sa, 2)  # (Ka*(Sb+1), Sa, 2)

    nc = dn.row_map.shape[0] // _CHUNK_TERMS
    xs = (dn.row_map.reshape(nc, _CHUNK_TERMS, sb),
          dn.h_dense.reshape(nc, _CHUNK_TERMS, sb, sa))
    if axis_name is not None and axis_size > 1:
        xs = _shard_chunks(xs, axis_name, axis_size)

    def body(acc, xs):
        rm, h = xs                                  # (KC, Sb), (KC, Sb, Sa)
        t = r1t[rm]                                 # (KC, Sb, Sa, 2)
        return (acc[0] + jnp.einsum("kba,kba->ba", h, t[..., 0]),
                acc[1] + jnp.einsum("kba,kba->ba", h, t[..., 1])), None

    (n_re, n_im), _ = jax.lax.scan(
        body,
        (jnp.zeros((sb, sa), jnp.float32), jnp.zeros((sb, sa), jnp.float32)),
        xs,
    )
    if axis_name is not None and axis_size > 1:
        n_re, n_im = jax.lax.psum((n_re, n_im), axis_name)

    # numerator at the queried cells ([rb, ra] layout)
    idx = idx_t if queries is None else rank_index(rank_spec, q_states)
    ra = jnp.minimum(idx // sb, sa)
    rb = jnp.where(idx >= sa * sb, 0, idx % sb)
    flat_t = jnp.where(idx >= sa * sb, sb * sa, rb * sa + ra)
    n_pack = jnp.concatenate(
        [n_re.reshape(-1, 1), n_im.reshape(-1, 1)], axis=1)
    n_pack = jnp.concatenate(
        [n_pack, jnp.zeros((1, 2), jnp.float32)], axis=0)
    n_s = n_pack[flat_t]                            # (Uq, 2)

    ratio = jnp.exp(jnp.clip(ref - q_la, -30.0, 30.0)).astype(jnp.float32)
    c, s_ = jnp.cos(q_ph).astype(jnp.float32), jnp.sin(q_ph).astype(jnp.float32)
    e_re = (ratio * (n_s[:, 0] * c + n_s[:, 1] * s_)).astype(jnp.float64)
    e_im = (ratio * (n_s[:, 1] * c - n_s[:, 0] * s_)).astype(jnp.float64)

    e_diag = dn.e_diag[jnp.minimum(idx, sa * sb)]
    return e_diag + e_re, e_im


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class FactorTerms:
    """Factored grid program for mid-size single-sector spaces.

    Same permutation-factorization as DenseTerms, but nothing O(Kxy * grid)
    is ever stored: the alpha-side permutations materialize once per call
    as R1t = U[pa_idx] transposed (a (Ka, Sb+1, Sa) buffer, a few GB for
    H2O 6-31G), the beta side is a static row map into it, and the H
    values build on the fly from rank-1 parity factors

        H_x = sum_r coeff_r * par_a[ya_r] (x) par_b[yb_r]

    as small batched MXU matmuls (molecular flip masks carry <= ~54 flat
    terms each). Per-call cost is O(grid * Kxy) elementwise work at HBM
    bandwidth, INDEPENDENT of the sample count -- built for the reference
    production window (1e5 unique) on H2O 6-31G / H4O2, where the
    per-pair rank gather costs ~1.4 s/call.
    """

    pa_idx: jnp.ndarray    # (Ka, Sa) int32 into U rows [0, Sa]
    row_map: jnp.ndarray   # (Kxy_pad, Sb) int32 into R1t rows [ka*(Sb+1)+rb']
    par_a: jnp.ndarray     # (Kya, Sa) f32 +-1 alpha parity rows
    par_b: jnp.ndarray     # (Kyb, Sb) f32 +-1 beta parity rows
    fa_idx: jnp.ndarray    # (Kxy_pad, R) int32 rows of par_a
    fb_idx: jnp.ndarray    # (Kxy_pad, R) int32 rows of par_b
    fcoeff: jnp.ndarray    # (Kxy_pad, R) f32 flat-term coefficients (0 pad)
    e_diag: jnp.ndarray    # (Sa*Sb + 1,) f64
    sa: int
    sb: int

    def tree_flatten(self):
        return ((self.pa_idx, self.row_map, self.par_a, self.par_b,
                 self.fa_idx, self.fb_idx, self.fcoeff, self.e_diag),
                (self.sa, self.sb))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, sa=aux[0], sb=aux[1])

    @staticmethod
    def supported(terms, hilbert) -> bool:
        if len(set(hilbert.sectors)) != 1:
            return False
        if hilbert.sector_size > FACT_SIZE_MAX:
            return False
        (na, nb), = set(hilbert.sectors)
        s = hilbert.n_shells
        sa, sb = comb(s, na), comb(s, nb)
        r_max = int(np.bincount(np.asarray(terms.gxy)).max())
        if r_max > _FACT_R:
            return False
        # alpha flip-mask count bounds the R1t buffer
        xy = np.asarray(terms.xy_unique, dtype=np.uint64)
        xa = np.zeros(len(xy), np.int64)
        for j in range(s):
            xa |= ((xy >> np.uint64(2 * j)) & 1).astype(np.int64) << j
        ka = len(np.unique(xa))
        return ka * sa * (sb + 1) * 8 <= FACT_R1_BYTES_MAX

    @staticmethod
    def build(terms, hilbert) -> "FactorTerms":
        assert FactorTerms.supported(terms, hilbert)
        (na, nb), = set(hilbert.sectors)
        s = hilbert.n_shells
        alpha_packed = _colex_ranks(s, na)
        beta_packed = _colex_ranks(s, nb)
        sa, sb = len(alpha_packed), len(beta_packed)

        def split(masks):
            a = np.zeros(len(masks), np.int64)
            b = np.zeros(len(masks), np.int64)
            for j in range(s):
                a |= ((masks >> np.uint64(2 * j)) & 1).astype(np.int64) << j
                b |= ((masks >> np.uint64(2 * j + 1)) & 1).astype(np.int64) << j
            return a, b

        xy = np.asarray(terms.xy_unique, dtype=np.uint64)
        xa, xb = split(xy)
        ua, ga = np.unique(xa, return_inverse=True)
        ub, gb = np.unique(xb, return_inverse=True)
        pa_idx = np.stack(
            [_perm_map(alpha_packed, int(f), invalid=sa) for f in ua])
        pb_idx = np.stack(
            [_perm_map(beta_packed, int(f), invalid=sb) for f in ub])
        row_map = (ga[:, None] * (sb + 1) + pb_idx[gb]).astype(np.int32)

        # rank-1 H factors from the flat term list
        yz = np.asarray(terms.yz_unique, np.uint64)[np.asarray(terms.gyz)]
        ya, yb = split(yz)
        uya, ja = np.unique(ya, return_inverse=True)
        uyb, jb = np.unique(yb, return_inverse=True)
        par_a = 1.0 - 2.0 * (np.bitwise_count(
            alpha_packed[None, :].astype(np.uint64)
            & uya[:, None].astype(np.uint64)) & 1).astype(np.float32)
        par_b = 1.0 - 2.0 * (np.bitwise_count(
            beta_packed[None, :].astype(np.uint64)
            & uyb[:, None].astype(np.uint64)) & 1).astype(np.float32)

        kxy = len(xy)
        gxy = np.asarray(terms.gxy)
        coeff = np.asarray(terms.coeff, np.float32)
        fa_idx = np.zeros((kxy, _FACT_R), np.int32)
        fb_idx = np.zeros((kxy, _FACT_R), np.int32)
        fcoeff = np.zeros((kxy, _FACT_R), np.float32)
        fill = np.zeros((kxy,), np.int64)
        for j in range(len(coeff)):
            x = gxy[j]
            r = fill[x]
            fa_idx[x, r] = ja[j]
            fb_idx[x, r] = jb[j]
            fcoeff[x, r] = coeff[j]
            fill[x] = r + 1

        # f64 diagonal over the grid in rank order ([ra, rb] flat)
        state_grid = (
            _expand_qubits(alpha_packed, 0, s)[:, None]
            | _expand_qubits(beta_packed, 1, s)[None, :]
        ).reshape(-1)  # (Sa*Sb,)
        e_diag = np.zeros((sa * sb + 1,), np.float64)
        dyz = np.asarray(terms.diag_yz, np.uint64)
        dco = np.asarray(terms.diag_coeff, np.float64)
        for j in range(len(dco)):
            par = 1.0 - 2.0 * (
                np.bitwise_count(state_grid & dyz[j]) & np.uint64(1)
            ).astype(np.float64)
            e_diag[:-1] += dco[j] * par

        kp = -(-kxy // _FACT_CHUNK_PAIRS) * _FACT_CHUNK_PAIRS
        if kp != kxy:
            pad = kp - kxy
            row_map = np.concatenate(
                [row_map, np.zeros((pad, sb), np.int32)])
            fa_idx = np.concatenate([fa_idx, np.zeros((pad, _FACT_R), np.int32)])
            fb_idx = np.concatenate([fb_idx, np.zeros((pad, _FACT_R), np.int32)])
            fcoeff = np.concatenate(
                [fcoeff, np.zeros((pad, _FACT_R), np.float32)])

        return FactorTerms(
            pa_idx=jnp.asarray(pa_idx), row_map=jnp.asarray(row_map),
            par_a=jnp.asarray(par_a), par_b=jnp.asarray(par_b),
            fa_idx=jnp.asarray(fa_idx), fb_idx=jnp.asarray(fb_idx),
            fcoeff=jnp.asarray(fcoeff), e_diag=jnp.asarray(e_diag),
            sa=sa, sb=sb,
        )


def factored_local_energy(
    fn: FactorTerms,
    rank_spec,
    states: jnp.ndarray,
    log_amp: jnp.ndarray,
    phase: jnp.ndarray,
    n_valid: jnp.ndarray,
    queries=None,
    axis_name: str | None = None,
    axis_size: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """E_loc (re, im) via the factored grid program (see FactorTerms).

    queries/axis_name/axis_size: as in dense_local_energy — readout rows
    restricted to the queries, term-chunk scan split over the mesh axis
    with a psum of the numerator grid.
    """
    from naqs_tpu.ops.rank import rank_index

    q_states, q_la, q_ph = (states, log_amp, phase) if queries is None else queries
    sa, sb = fn.sa, fn.sb
    u = states.shape[0]
    live = jnp.arange(u) < n_valid
    la = jnp.where(live, log_amp, -jnp.inf)
    ref = jnp.max(la)
    w = jnp.where(live, jnp.exp(log_amp - ref), 0.0).astype(jnp.float32)
    u_re = w * jnp.cos(phase).astype(jnp.float32)
    u_im = w * jnp.sin(phase).astype(jnp.float32)

    idx_t = rank_index(rank_spec, states)
    ra_t = jnp.minimum(idx_t // sb, sa)
    rb_t = jnp.where(idx_t >= sa * sb, 0, idx_t % sb)
    grid = jnp.zeros((sa + 1, sb + 1, 2), jnp.float32)
    grid = grid.at[ra_t, rb_t].set(jnp.stack([u_re, u_im], axis=-1), mode="drop")

    # alpha permutations materialized once; XLA fuses gather+transpose
    r1t = jnp.swapaxes(grid[fn.pa_idx], 1, 2)      # (Ka, Sb+1, Sa, 2)
    r1t = r1t.reshape(-1, sa, 2)

    nc = fn.row_map.shape[0] // _FACT_CHUNK_PAIRS
    xs = (fn.row_map.reshape(nc, _FACT_CHUNK_PAIRS, sb),
          fn.fa_idx.reshape(nc, _FACT_CHUNK_PAIRS, _FACT_R),
          fn.fb_idx.reshape(nc, _FACT_CHUNK_PAIRS, _FACT_R),
          fn.fcoeff.reshape(nc, _FACT_CHUNK_PAIRS, _FACT_R))
    if axis_name is not None and axis_size > 1:
        xs = _shard_chunks(xs, axis_name, axis_size)

    def body(acc, xs):
        rm, fa, fb, fc = xs
        t = r1t[rm]                                # (KC, Sb, Sa, 2)
        pa = fn.par_a[fa]                          # (KC, R, Sa)
        pb = fn.par_b[fb] * fc[:, :, None]         # (KC, R, Sb)
        h = jnp.einsum(
            "krb,kra->kba", pb, pa,
            precision=jax.lax.Precision.HIGHEST)   # (KC, Sb, Sa)
        return (acc[0] + jnp.einsum("kba,kba->ba", h, t[..., 0]),
                acc[1] + jnp.einsum("kba,kba->ba", h, t[..., 1])), None

    (n_re, n_im), _ = jax.lax.scan(
        body,
        (jnp.zeros((sb, sa), jnp.float32), jnp.zeros((sb, sa), jnp.float32)),
        xs,
    )
    if axis_name is not None and axis_size > 1:
        n_re, n_im = jax.lax.psum((n_re, n_im), axis_name)

    idx = idx_t if queries is None else rank_index(rank_spec, q_states)
    ra = jnp.minimum(idx // sb, sa)
    rb = jnp.where(idx >= sa * sb, 0, idx % sb)
    flat_t = jnp.where(idx >= sa * sb, sb * sa, rb * sa + ra)
    n_pack = jnp.concatenate(
        [n_re.reshape(-1, 1), n_im.reshape(-1, 1)], axis=1)
    n_pack = jnp.concatenate(
        [n_pack, jnp.zeros((1, 2), jnp.float32)], axis=0)
    n_s = n_pack[flat_t]

    ratio = jnp.exp(jnp.clip(ref - q_la, -30.0, 30.0)).astype(jnp.float32)
    c, s_ = jnp.cos(q_ph).astype(jnp.float32), jnp.sin(q_ph).astype(jnp.float32)
    e_re = (ratio * (n_s[:, 0] * c + n_s[:, 1] * s_)).astype(jnp.float64)
    e_im = (ratio * (n_s[:, 1] * c - n_s[:, 0] * s_)).astype(jnp.float64)
    e_diag = fn.e_diag[jnp.minimum(idx, sa * sb)]
    return e_diag + e_re, e_im


# ---------------------------------------------------------------------------
# FactorTermsXL: exc-blocked staircase grid for n_exc-filtered sectors
# ---------------------------------------------------------------------------

# XL caps: staircase cells (numerator carry + diagonal) and the rectangular
# U / R1T working buffers. Defaults cover Li2O CISDTQ (644,365 cells;
# 5056^2 * 8 B = 204 MB buffers).
XL_CELLS_MAX = int(os.environ.get("NAQS_TPU_XL_CELLS_MAX", 1 << 23))
XL_U_BYTES_MAX = int(os.environ.get("NAQS_TPU_XL_U_MAX", 1 << 28))
_XL_CHUNK = 64  # max masks per scan step (bounds the (g, cells, 2) T buffer)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class FactorTermsXL:
    """Exc-blocked factored grid program for n_exc_max-filtered sectors.

    FactorTerms computes the FULL rectangular (Sa, Sb) sector grid, which is
    wasteful (or impossible: Li2O's full grid is 41.4M cells, its r1t buffer
    151 GB) when an n_excitations_max filter keeps only a sliver. The
    excitation count is SEPARABLE: exc(s) = exc_a(alpha) + exc_b(beta)
    (utils/hilbert.py:124-148), so the valid set factorizes into a block
    STAIRCASE: order alpha combos by (exc_a, colex) and beta combos by
    (exc_b, colex); a cell (a, b) is valid iff exc_a(a) + exc_b(b) <= E,
    i.e. each alpha block ka sees a contiguous beta PREFIX of width
    P[E-ka]. Li2O CISDTQ: 644,365 staircase cells vs 25.6M restricted-
    rectangular vs 41.4M full — a 40x compute cut that makes exact-mode
    training over the whole CISDTQ basis tractable (the rank engine's
    644k-query expansion reproducibly wedged the tunnel, fleet.py notes).

    Per call: scan over alpha-flip-mask groups; each step materializes ONE
    alpha-permuted transposed copy of the (Sa*+1, Sb*+1) value grid
    (stage 1, the HBM-bandwidth cost), then contracts that group's masks
    against on-the-fly rank-1 Hamiltonian factors BLOCK-WISE, touching only
    staircase cells (stage 2). Groups are split into <=_XL_CHUNK-mask
    chunks and bucketed by pow-2 padded size so the compiled program is a
    handful of static-shape scans.

    Reference semantics matched: H restricted to the n_exc<=E basis — a
    coupled state outside the staircase reads the zero pad row/col, i.e.
    psi=0 truncation exactly like hamiltonian.py:321-328's full2restricted
    == -1 masking.
    """

    perm_a: jnp.ndarray    # (Sa_full+1,) int32 colex rank -> blocked idx | Sa*
    perm_b: jnp.ndarray    # (Sb_full+1,) int32
    width: jnp.ndarray     # (Sa*+1,) int32 staircase row width (sentinel 0)
    cells_off: jnp.ndarray  # (Sa*+1,) int32 packed row offset (sentinel -> n_cells)
    pa_idx: jnp.ndarray    # (Ka, Sa*) int32 alpha image under each flip | Sa*
    pb_idx: jnp.ndarray    # (Kb, Sb*) int32
    par_a: jnp.ndarray     # (Kya, Sa*) f32 +-1 parities, blocked column order
    par_b: jnp.ndarray     # (Kyb, Sb*) f32
    e_diag: jnp.ndarray    # (n_cells + 1,) f64, 0 at the sentinel
    # per-bucket scan inputs (tuples over buckets; each entry stacked (G, ...)):
    b_pa_row: tuple        # (G,) int32 row of pa_idx for the chunk's xa group
    b_pb_row: tuple        # (G, gsz) int32 rows of pb_idx (0 pad)
    b_fa: tuple            # (G, gsz, R) int32 rows of par_a (0 pad)
    b_fb: tuple            # (G, gsz, R) int32 rows of par_b (0 pad)
    b_fc: tuple            # (G, gsz, R) f32 coefficients (0 pad = exact no-op)
    # per-bucket per-block STATIC beta-row bound for the stage-1 slice:
    # spin-conserving flip masks move a state at most ceil(db/2) beta-exc
    # blocks, so block k's permuted reads live in the beta prefix
    # P[min(E, E-k+db_max)] — slicing stage 1 to that prefix cuts the
    # materialized traffic ~19x on Li2O CISDTQ (351/457 alpha groups are
    # pure-alpha: their reads are exactly the 644k staircase cells, not
    # the 25.6M full grid). Buckets are keyed by (gsz, db_max).
    b_pneed: tuple         # tuple over buckets of tuple over blocks of int
    sa: int                # Sa* (blocked alpha count)
    sb: int                # Sb*
    sa_full: int
    sb_full: int
    blocks: tuple          # ((a_off, a_cnt, p_width), ...) per alpha exc block
    n_cells: int

    def tree_flatten(self):
        return (
            (self.perm_a, self.perm_b, self.width, self.cells_off,
             self.pa_idx, self.pb_idx, self.par_a, self.par_b, self.e_diag,
             self.b_pa_row, self.b_pb_row, self.b_fa, self.b_fb, self.b_fc),
            (self.sa, self.sb, self.sa_full, self.sb_full, self.blocks,
             self.n_cells, self.b_pneed),
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, b_pneed=aux[6], sa=aux[0], sb=aux[1],
                   sa_full=aux[2], sb_full=aux[3], blocks=aux[4],
                   n_cells=aux[5])

    @staticmethod
    def supported(terms, hilbert) -> bool:
        if hilbert.n_exc_max is None or len(set(hilbert.sectors)) != 1:
            return False
        if int(np.bincount(np.asarray(terms.gxy)).max()) > _FACT_R:
            return False
        (na, nb), = set(hilbert.sectors)
        s = hilbert.n_shells
        E = hilbert.n_exc_max
        a_cnt = [comb(na, k) * comb(s - na, k) for k in range(min(E, na, s - na) + 1)]
        b_cnt = [comb(nb, k) * comb(s - nb, k) for k in range(min(E, nb, s - nb) + 1)]
        sa_r, sb_r = sum(a_cnt), sum(b_cnt)
        cells = sum(
            ca * sum(b_cnt[: max(0, E - k + 1)]) for k, ca in enumerate(a_cnt))
        return (cells <= XL_CELLS_MAX
                and (sa_r + 1) * (sb_r + 1) * 8 <= XL_U_BYTES_MAX)

    @staticmethod
    def build(terms, hilbert) -> "FactorTermsXL":
        assert FactorTermsXL.supported(terms, hilbert)
        (na, nb), = set(hilbert.sectors)
        s = hilbert.n_shells
        E = hilbert.n_exc_max

        def blocked(n_occ):
            packed = _colex_ranks(s, n_occ)           # colex order
            hf = (1 << n_occ) - 1
            exc = np.bitwise_count(
                packed.astype(np.uint64) & np.uint64(~hf & ((1 << s) - 1)))
            keep = exc <= E
            order = np.lexsort((np.arange(len(packed)), exc))  # (exc, colex)
            order = order[keep[order]]
            n_r = len(order)
            perm = np.full(len(packed) + 1, n_r, np.int32)
            perm[order] = np.arange(n_r, dtype=np.int32)
            cnt = np.bincount(exc[order].astype(np.int64),
                              minlength=E + 1).astype(np.int64)
            return packed, order, perm, cnt

        alpha_packed, a_sel, perm_a, a_cnt = blocked(na)
        beta_packed, b_sel, perm_b, b_cnt = blocked(nb)
        sa_r, sb_r = len(a_sel), len(b_sel)
        sa_full, sb_full = len(alpha_packed), len(beta_packed)
        b_cum = np.cumsum(b_cnt)                       # beta prefix widths
        p_of_k = np.array([b_cum[min(E - k, E)] if k <= E else 0
                           for k in range(E + 1)], np.int64)

        # per-row widths and packed offsets (rows ordered by (ka, colex))
        ka_of_row = np.repeat(np.arange(E + 1), a_cnt)
        width = np.zeros(sa_r + 1, np.int32)
        width[:sa_r] = p_of_k[ka_of_row]
        cells_off = np.zeros(sa_r + 1, np.int32)
        cells_off[1:] = np.cumsum(width[:sa_r])
        n_cells = int(cells_off[sa_r])
        a_off = np.concatenate([[0], np.cumsum(a_cnt)])
        blocks = tuple(
            (int(a_off[k]), int(a_cnt[k]), int(p_of_k[k]))
            for k in range(E + 1) if a_cnt[k] > 0)

        def split(masks):
            a = np.zeros(len(masks), np.int64)
            b = np.zeros(len(masks), np.int64)
            for j in range(s):
                a |= ((masks >> np.uint64(2 * j)) & 1).astype(np.int64) << j
                b |= ((masks >> np.uint64(2 * j + 1)) & 1).astype(np.int64) << j
            return a, b

        xy = np.asarray(terms.xy_unique, dtype=np.uint64)
        xa, xb = split(xy)
        ua, ga = np.unique(xa, return_inverse=True)
        ub, gb = np.unique(xb, return_inverse=True)

        def image_map(packed, sel, perm, flips, n_r):
            """(len(flips), n_r) int32: blocked idx -> blocked idx of ^flip."""
            rank_of = {int(p): r for r, p in enumerate(packed)}
            out = np.full((len(flips), n_r), n_r, np.int32)
            sel_packed = packed[sel]
            for fi, f in enumerate(flips):
                for r, p in enumerate(sel_packed):
                    q = rank_of.get(int(p) ^ int(f))
                    if q is not None:
                        out[fi, r] = perm[q]           # may be n_r (exc > E)
            return out

        pa_idx = image_map(alpha_packed, a_sel, perm_a, ua, sa_r)
        pb_idx = image_map(beta_packed, b_sel, perm_b, ub, sb_r)

        # rank-1 parity factors over the BLOCKED combo orders
        yz = np.asarray(terms.yz_unique, np.uint64)[np.asarray(terms.gyz)]
        ya, yb = split(yz)
        uya, ja = np.unique(ya, return_inverse=True)
        uyb, jb = np.unique(yb, return_inverse=True)
        par_a = 1.0 - 2.0 * (np.bitwise_count(
            alpha_packed[a_sel][None, :].astype(np.uint64)
            & uya[:, None].astype(np.uint64)) & 1).astype(np.float32)
        par_b = 1.0 - 2.0 * (np.bitwise_count(
            beta_packed[b_sel][None, :].astype(np.uint64)
            & uyb[:, None].astype(np.uint64)) & 1).astype(np.float32)

        kxy = len(xy)
        gxy = np.asarray(terms.gxy)
        coeff = np.asarray(terms.coeff, np.float32)
        fa_idx = np.zeros((kxy, _FACT_R), np.int32)
        fb_idx = np.zeros((kxy, _FACT_R), np.int32)
        fcoeff = np.zeros((kxy, _FACT_R), np.float32)
        fill = np.zeros((kxy,), np.int64)
        for j in range(len(coeff)):
            x = gxy[j]
            r = fill[x]
            fa_idx[x, r] = ja[j]
            fb_idx[x, r] = jb[j]
            fcoeff[x, r] = coeff[j]
            fill[x] = r + 1

        # group masks by alpha flip, split groups into <=_XL_CHUNK chunks,
        # bucket chunks by (pow-2 padded size, beta-excursion bound) -> a
        # few static-shape scans whose stage-1 slices are statically sized
        from collections import defaultdict

        db_bits = np.bitwise_count(ub.astype(np.uint64)).astype(np.int64)
        group_masks = defaultdict(list)
        for k in range(kxy):
            group_masks[int(ga[k])].append(k)
        chunks = []
        for g, ms in sorted(group_masks.items()):
            for i in range(0, len(ms), _XL_CHUNK):
                chunks.append((g, ms[i:i + _XL_CHUNK]))
        buckets = defaultdict(list)
        for g, ms in chunks:
            gsz = 1 << int(np.ceil(np.log2(len(ms))))
            # spin-conserving flips move exc_b by at most db/2 (db beta-bit
            # flips = db/2 same-spin creation/annihilation pairs)
            dbmax = int(max((int(db_bits[gb[m]]) + 1) // 2 for m in ms))
            buckets[(max(1, gsz), min(dbmax, E))].append((g, ms))
        b_pa_row, b_pb_row, b_fa, b_fb, b_fc, b_pneed = [], [], [], [], [], []
        for gsz, dbmax in sorted(buckets):
            entries = buckets[(gsz, dbmax)]
            b_pneed.append(tuple(
                int(p_of_k[max(0, k - dbmax)])
                for k in range(E + 1) if a_cnt[k] > 0))
            G = len(entries)
            pa_row = np.zeros((G,), np.int32)
            pb_row = np.zeros((G, gsz), np.int32)
            fa = np.zeros((G, gsz, _FACT_R), np.int32)
            fb = np.zeros((G, gsz, _FACT_R), np.int32)
            fc = np.zeros((G, gsz, _FACT_R), np.float32)
            for i, (g, ms) in enumerate(entries):
                pa_row[i] = g
                for j, m in enumerate(ms):
                    pb_row[i, j] = gb[m]
                    fa[i, j] = fa_idx[m]
                    fb[i, j] = fb_idx[m]
                    fc[i, j] = fcoeff[m]
            b_pa_row.append(jnp.asarray(pa_row))
            b_pb_row.append(jnp.asarray(pb_row))
            b_fa.append(jnp.asarray(fa))
            b_fb.append(jnp.asarray(fb))
            b_fc.append(jnp.asarray(fc))

        # f64 diagonal over the staircase cells in packed order
        a_states = _expand_qubits(alpha_packed[a_sel], 0, s)
        b_states = _expand_qubits(beta_packed[b_sel], 1, s)
        cell_states = np.concatenate(
            [(a_states[off:off + cnt, None] | b_states[None, :pw]).ravel()
             for off, cnt, pw in blocks])
        assert len(cell_states) == n_cells
        e_diag = np.zeros((n_cells + 1,), np.float64)
        dyz = np.asarray(terms.diag_yz, np.uint64)
        dco = np.asarray(terms.diag_coeff, np.float64)
        for j in range(len(dco)):
            par = 1.0 - 2.0 * (
                np.bitwise_count(cell_states & dyz[j]) & np.uint64(1)
            ).astype(np.float64)
            e_diag[:-1] += dco[j] * par

        return FactorTermsXL(
            perm_a=jnp.asarray(perm_a), perm_b=jnp.asarray(perm_b),
            width=jnp.asarray(width), cells_off=jnp.asarray(cells_off),
            pa_idx=jnp.asarray(pa_idx), pb_idx=jnp.asarray(pb_idx),
            par_a=jnp.asarray(par_a), par_b=jnp.asarray(par_b),
            e_diag=jnp.asarray(e_diag),
            b_pa_row=tuple(b_pa_row), b_pb_row=tuple(b_pb_row),
            b_fa=tuple(b_fa), b_fb=tuple(b_fb), b_fc=tuple(b_fc),
            b_pneed=tuple(b_pneed),
            sa=sa_r, sb=sb_r, sa_full=sa_full, sb_full=sb_full,
            blocks=blocks, n_cells=n_cells,
        )


def _xl_blocked_idx(fn: FactorTermsXL, rank_spec, ss):
    """(a_hat, b_hat) blocked combo indices of packed states (sa/sb invalid)."""
    from naqs_tpu.ops.rank import rank_index

    idx = rank_index(rank_spec, ss)
    full = fn.sa_full * fn.sb_full
    ra = jnp.minimum(idx // fn.sb_full, fn.sa_full)
    rb = jnp.where(idx >= full, fn.sb_full, idx % fn.sb_full)
    return fn.perm_a[ra], fn.perm_b[rb]


def factored_xl_local_energy(
    fn: FactorTermsXL,
    rank_spec,
    states: jnp.ndarray,
    log_amp: jnp.ndarray,
    phase: jnp.ndarray,
    n_valid: jnp.ndarray,
    queries=None,
    axis_name: str | None = None,
    axis_size: int = 1,
    diag=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """E_loc (re, im) via the exc-blocked staircase program (FactorTermsXL).

    Semantics match the other engines: psi = 0 outside the sampled set AND
    outside the n_exc_max-restricted basis; rows past n_valid are garbage.
    queries/axis_name/axis_size as in dense_local_energy (the group scans
    are sharded over the mesh axis; the staircase numerator blocks psum).
    diag=(diag_yz, diag_coeff): with it, queries OUTSIDE the staircase get
    their true on-the-fly diagonal ONLY (off-diagonal couplings back into
    the sampled support are still truncated to psi' = 0 — full DenseTerms
    parity would resolve those too). A bias mitigation for leaked
    partial-mask sample mass, weighted only by that leaked mass, not an
    exact-parity path.
    """
    q_states, q_la, q_ph = (states, log_amp, phase) if queries is None else queries
    sa, sb = fn.sa, fn.sb
    u = states.shape[0]
    live = jnp.arange(u) < n_valid
    la = jnp.where(live, log_amp, -jnp.inf)
    ref = jnp.max(la)
    w = jnp.where(live, jnp.exp(log_amp - ref), 0.0).astype(jnp.float32)
    u_re = w * jnp.cos(phase).astype(jnp.float32)
    u_im = w * jnp.sin(phase).astype(jnp.float32)

    ah, bh = _xl_blocked_idx(fn, rank_spec, states)
    ah = jnp.where(live, ah, sa)
    bh = jnp.where(live, bh, sb)
    grid = jnp.zeros((sa + 1, sb + 1, 2), jnp.float32)
    grid = grid.at[ah, bh].set(jnp.stack([u_re, u_im], axis=-1), mode="drop")
    # the pad row/col must read as psi=0 (SENTINEL buffer rows land there)
    grid = grid.at[sa, :].set(0.0)
    grid = grid.at[:, sb].set(0.0)

    n_blocks = tuple(
        jnp.zeros((pw, cnt, 2), jnp.float32) for (_, cnt, pw) in fn.blocks)

    # pre-materialize the distinct beta-prefix slices of the grid ONCE per
    # call (a handful of P-value widths): the per-block stage-1 gathers
    # read from these, and an explicit copy guarantees the loop-invariant
    # slice is hoisted out of the scans rather than re-fused per trip
    pneed_all = sorted({p for pn in fn.b_pneed for p in pn})
    grid_sliced = {p: (grid if p >= sb + 1
                       else jax.lax.slice_in_dim(grid, 0, p, axis=1))
                   for p in pneed_all}

    for bi in range(len(fn.b_pa_row)):
        xs = (fn.b_pa_row[bi], fn.b_pb_row[bi],
              fn.b_fa[bi], fn.b_fb[bi], fn.b_fc[bi])
        if axis_name is not None and axis_size > 1:
            xs = _shard_chunks(xs, axis_name, axis_size)
        pneed_blk = fn.b_pneed[bi]

        def body(carry, x, pneed_blk=pneed_blk):
            pa_r, pb_r, fa_c, fb_c, fc_c = x
            pa_full = fn.pa_idx[pa_r]                        # (sa,)
            pbsel = fn.pb_idx[pb_r]                          # (g, sb)
            out = []
            for k, (a_off, a_cnt, pw) in enumerate(fn.blocks):
                # stage 1, PER BLOCK and beta-sliced: the permuted reads of
                # block k live in the beta prefix pneed (bucket-static; see
                # b_pneed) — materialize only (a_cnt, pneed) of the
                # alpha-permuted grid instead of the full (sa, sb) copy.
                # Row pneed is an explicit zero row: out-of-staircase beta
                # images (pb_idx sentinel sb) clamp onto it and read psi=0.
                pneed = pneed_blk[k]
                rows_k = jax.lax.dynamic_slice_in_dim(pa_full, a_off, a_cnt)
                gk = grid_sliced[pneed][rows_k]
                r1t_k = jnp.concatenate(
                    [jnp.swapaxes(gk, 0, 1),
                     jnp.zeros((1, a_cnt, 2), jnp.float32)], axis=0)
                pb_k = jnp.minimum(pbsel[:, :pw], pneed)
                # stage 2: staircase-restricted row gather + contraction
                t = r1t_k[pb_k]                              # (g, pw, a_cnt, 2)
                pa_f = jax.lax.dynamic_slice_in_dim(
                    fn.par_a[fa_c], a_off, a_cnt, axis=2)    # (g, R, a_cnt)
                pb_f = fn.par_b[fb_c][:, :, :pw] * fc_c[:, :, None]
                h = jnp.einsum(
                    "grp,gra->gpa", pb_f, pa_f,
                    precision=jax.lax.Precision.HIGHEST)     # (g, pw, a_cnt)
                out.append(carry[k] + jnp.stack(
                    [jnp.einsum("gpa,gpa->pa", h, t[..., 0]),
                     jnp.einsum("gpa,gpa->pa", h, t[..., 1])], axis=-1))
            return tuple(out), None

        n_blocks, _ = jax.lax.scan(body, n_blocks, xs)

    if axis_name is not None and axis_size > 1:
        n_blocks = jax.lax.psum(n_blocks, axis_name)

    # packed readout: (a-major, beta-prefix) order matches cells_off
    n_pack = jnp.concatenate(
        [jnp.swapaxes(blk, 0, 1).reshape(-1, 2) for blk in n_blocks]
        + [jnp.zeros((1, 2), jnp.float32)], axis=0)

    ahq, bhq = _xl_blocked_idx(fn, rank_spec, q_states)
    wq = fn.width[jnp.minimum(ahq, sa)]
    valid = (ahq < sa) & (bhq < wq)
    cell = jnp.where(valid, fn.cells_off[jnp.minimum(ahq, sa)] + bhq,
                     fn.n_cells)
    n_s = n_pack[cell]

    ratio = jnp.exp(jnp.clip(ref - q_la, -30.0, 30.0)).astype(jnp.float32)
    c, s_ = jnp.cos(q_ph).astype(jnp.float32), jnp.sin(q_ph).astype(jnp.float32)
    e_re = (ratio * (n_s[:, 0] * c + n_s[:, 1] * s_)).astype(jnp.float64)
    e_im = (ratio * (n_s[:, 1] * c - n_s[:, 0] * s_)).astype(jnp.float64)
    e_diag = fn.e_diag[cell]
    if diag is not None:
        from naqs_tpu.utils.bits import parity_pm1

        diag_yz, diag_coeff = diag
        par = parity_pm1(q_states[:, None] & diag_yz).astype(jnp.float64)
        e_diag = jnp.where(valid, e_diag, jnp.sum(par * diag_coeff, axis=-1))
    return e_diag + e_re, e_im
