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
