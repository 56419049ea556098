"""Microbenchmark lookup primitives on the TPU to pick the engine design.

Shapes model N2 sto-3g at M=8192 sampled states, Kxy=800 unique flip masks:
Q = M*Kxy ~ 6.5M membership lookups per local-energy call.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

M = 8192
K = 800
Q = M * K
NBITS = 20

rng = np.random.default_rng(0)
table_np = np.sort(rng.choice(2**NBITS, size=M, replace=False))
queries_np = rng.integers(0, 2**NBITS, size=Q)

tab64 = jnp.asarray(table_np.astype(np.uint64))
q64 = jnp.asarray(queries_np.astype(np.uint64))
tab32 = jnp.asarray(table_np.astype(np.int32))
q32 = jnp.asarray(queries_np.astype(np.int32))
rec = jnp.asarray(rng.integers(-2**31, 2**31, size=(M, 4)).astype(np.int32))
vals1 = rec[:, 0]
lut = jnp.zeros((2**NBITS,), jnp.int32).at[tab32].set(jnp.arange(M, dtype=jnp.int32) + 1)


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.3f} ms   ({Q/dt/1e9:.2f} G lookups/s)", flush=True)
    return dt


@jax.jit
def ss_sort_u64(tab, q):
    return jnp.searchsorted(tab, q, method="sort")


@jax.jit
def ss_sort_i32(tab, q):
    return jnp.searchsorted(tab, q, method="sort")


@jax.jit
def gather_rec(rec, pos):
    return rec[pos]


@jax.jit
def gather_1d(v, pos):
    return v[pos]


@jax.jit
def gather_lut(lut, q):
    return lut[q]


@jax.jit
def sort_i32(q):
    return jnp.sort(q)


@jax.jit
def sort_u64(q):
    return jnp.sort(q)


@jax.jit
def cosort_join(tab, q, vals):
    # sort-join: co-sort (keys, is_query, payload) and propagate table values
    # forward with a last-write-wins associative scan; queries read propagated.
    n_t, n_q = tab.shape[0], q.shape[0]
    keys = jnp.concatenate([tab, q])
    is_tab = jnp.concatenate([jnp.ones((n_t,), jnp.int32), jnp.zeros((n_q,), jnp.int32)])
    payload = jnp.concatenate([vals, jnp.zeros((n_q,), jnp.int32)])
    origin = jnp.concatenate([jnp.full((n_t,), -1, jnp.int32),
                              jnp.arange(n_q, dtype=jnp.int32)])
    sk, st, sp, so = jax.lax.sort((keys, 1 - is_tab, payload, origin), num_keys=2)

    def combine(a, b):
        ak, ap = a
        bk, bp = b
        keep_b = bk >= 0
        return (jnp.where(keep_b, bk, ak), jnp.where(keep_b, bp, ap))

    pk = jnp.where(st == 0, sk, -1)
    pp = jnp.where(st == 0, sp, 0)
    ck, cp = jax.lax.associative_scan(combine, (pk, pp))
    found = (ck == sk) & (st == 1)
    res = jnp.where(found, cp, 0)
    # scatter back to original query order
    out = jnp.zeros((n_q,), jnp.int32).at[so].set(res, mode="drop")
    return out


def pallas_taa(tab, q_blocks):
    """Pallas: table tile broadcast + take_along_axis gather within lanes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, W = q_blocks.shape  # rows of queries, W=2048 lanes
    T = tab.shape[0] // 2048

    def kernel(tab_ref, idx_ref, out_ref):
        idx = idx_ref[:]
        acc = jnp.zeros_like(idx)
        for t in range(T):
            tile = tab_ref[t * 2048:(t + 1) * 2048]
            tile_b = jnp.broadcast_to(tile[None, :], idx.shape)
            loc = idx - t * 2048
            inb = (loc >= 0) & (loc < 2048)
            locc = jnp.clip(loc, 0, 2047)
            g = jnp.take_along_axis(tile_b, locc, axis=1)
            acc = jnp.where(inb, g, acc)
        out_ref[:] = acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q_blocks.shape, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, W), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        grid=(R // 8,),
    )(tab, q_blocks)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    pos32 = ss_sort_i32(tab32, q32)
    pos = jnp.asarray(np.asarray(pos32).clip(0, M - 1))

    timeit("searchsorted sort uint64", ss_sort_u64, tab64, q64)
    timeit("searchsorted sort int32", ss_sort_i32, tab32, q32)
    timeit("gather rec (M,4)[pos]", gather_rec, rec, pos)
    timeit("gather 1d (M,)[pos]", gather_1d, vals1, pos)
    timeit("gather LUT (2^20,)[q]", gather_lut, lut, q32)
    timeit("sort 6.5M int32", sort_i32, q32)
    timeit("sort 6.5M uint64", sort_u64, q64)
    timeit("cosort_join (2 keys, 2 payload)", cosort_join, tab32, q32, vals1)

    # pallas take_along_axis gather: pos blocks of (8, 2048)
    posb = pos.reshape(-1, 2048)
    f = jax.jit(partial(pallas_taa))
    try:
        timeit("pallas taa gather (4 tiles)", f, tab32, posb)
    except Exception as e:
        print(f"pallas taa FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
