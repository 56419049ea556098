"""Pallas VMEM-resident table gather for the E_loc membership lookup.

The local-energy engine's hot op is one huge random gather: for every
sampled state s and every unique X/Y flip mask, fetch (log_amp, phase) of
the coupled state from the dense rank-indexed value table (reference
semantics: src/optimizer/energy.py:219-263, psi lookups into the sampled
set). XLA's TPU gather runs this at ~0.32 G rows/s regardless of row width
(measured on v5e: 20 ms per 6.5M rows from a (14408, 2) table) -- it is
per-row issue-bound, not bandwidth-bound.

For tables that fit VMEM (every sto-3g molecule and the N2/carleo suites),
this kernel instead keeps the whole value table on-chip and resolves each
query with vector compare/select sweeps over table tiles, using the one
dynamic-gather pattern Mosaic supports (`take_along_axis(tab, idx, axis=1)`
with idx.shape == tab.shape): for each table tile t of width W, the in-tile
lane offsets are gathered with take_along_axis and merged with a
range-mask select. Cost is O(T/W) VPU sweeps per query block, so this wins
for small-to-medium tables and loses to XLA's gather for very large ones;
`recommended()` picks the crossover.

Both value channels (log_amp, phase) ride the same sweep: the mask and
clipped offsets are computed once per tile.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# table-size cap for the VMEM path: 2 channels * 4 B * T must fit VMEM
# alongside the index/output blocks. 512k rows = 4 MB of tables.
TABLE_MAX = int(os.environ.get("NAQS_TPU_PALLAS_TABLE_MAX", 1 << 19))
# gather mode: "auto" (TPU + table fits -> pallas), "xla", "pallas".
# NOTE: "xla" stays the default because pallas_call cannot LOWER through
# the tunneled axon backend available here — jax's lowering recurses to a
# RecursionError both standalone and under an outer jit (measured
# scratch/probe_pallas_chip3.py, jax 0.8.x + axon plugin); the kernel is
# validated in interpret mode (tests/test_dyn_gather.py) and MODE=pallas
# is intended for direct (non-tunneled) TPU runtimes. The practical loss
# is small: the engine's dense-table row gather measured 1.01 G rows/s
# in-program on the v5e via XLA (6.4 ms / 6.5M rows), and the dense
# engine's P@A contraction, not the gather, now bounds E_loc throughput.
MODE = os.environ.get("NAQS_TPU_GATHER", "xla")

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _gather2_kernel(la_ref, ph_ref, idx_ref, la_out, ph_out, *, tile_w, n_tiles):
    """One (B, W) index block against the full (1, Tpad) tables."""
    ix = idx_ref[:]
    shape = ix.shape

    def body(t, carry):
        a_la, a_ph = carry
        start = t * tile_w
        la_t = jnp.broadcast_to(la_ref[:, pl.ds(start, tile_w)], shape)
        ph_t = jnp.broadcast_to(ph_ref[:, pl.ds(start, tile_w)], shape)
        loc = ix - start
        inb = (loc >= 0) & (loc < tile_w)
        locc = jnp.clip(loc, 0, tile_w - 1)
        g_la = jnp.take_along_axis(la_t, locc, axis=1)
        g_ph = jnp.take_along_axis(ph_t, locc, axis=1)
        return jnp.where(inb, g_la, a_la), jnp.where(inb, g_ph, a_ph)

    acc = (jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))
    a_la, a_ph = jax.lax.fori_loop(0, n_tiles, body, acc)
    la_out[:] = a_la
    ph_out[:] = a_ph


@functools.partial(
    jax.jit, static_argnames=("tile_w", "block_rows", "interpret"))
def table_gather2(
    la_tab: jnp.ndarray,   # (Tpad,) f32, Tpad % tile_w == 0
    ph_tab: jnp.ndarray,   # (Tpad,) f32
    idx: jnp.ndarray,      # any shape, int32 in [0, Tpad)
    *,
    tile_w: int = 2048,
    block_rows: int = 256,
    interpret: bool = False,
):
    """Gather (la_tab[idx], ph_tab[idx]) with the table resident in VMEM."""
    t = la_tab.shape[0]
    assert t % tile_w == 0, (t, tile_w)
    n_tiles = t // tile_w
    shape = idx.shape
    q = int(np.prod(shape))
    blk = block_rows * tile_w
    qp = _round_up(max(q, blk), blk)
    ix = jnp.ravel(idx)
    ix = jnp.pad(ix, (0, qp - q)).reshape(-1, tile_w)
    r = ix.shape[0]

    kernel = functools.partial(
        _gather2_kernel, tile_w=tile_w, n_tiles=n_tiles)
    la_o, ph_o = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((r, tile_w), jnp.float32),
            jax.ShapeDtypeStruct((r, tile_w), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, tile_w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_rows, tile_w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, tile_w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        grid=(r // block_rows,),
        interpret=interpret,
    )(la_tab.reshape(1, t), ph_tab.reshape(1, t), ix)
    return (la_o.ravel()[:q].reshape(shape), ph_o.ravel()[:q].reshape(shape))


def pallas_gather_enabled(table_rows: int) -> bool:
    """Trace-time policy: use the VMEM kernel for this table size?"""
    if MODE == "xla":
        return False
    if MODE == "pallas":
        return True
    if table_rows > TABLE_MAX:
        return False
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    return backend in ("tpu", "axon")


def pad_tables(table: jnp.ndarray, size: int, tile_w: int,
               miss: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(size+1, 2) value table -> padded (Tpad,) la and ph channel arrays.

    Pad slots hold the miss marker so a clipped/garbage index can never
    alias a live amplitude.
    """
    tpad = _round_up(size + 1, tile_w)
    la = jnp.full((tpad,), jnp.float32(miss))
    ph = jnp.zeros((tpad,), jnp.float32)
    la = la.at[: size + 1].set(table[:, 0])
    ph = ph.at[: size + 1].set(table[:, 1])
    return la, ph
