"""Row-width scaling of XLA gather + pallas taa gather, readback-timed."""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Q = 8192 * 800
T = 14408
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, T, size=Q).astype(np.int32))


def timed(name, fn, *args, iters=10):
    out = fn(*args)
    np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out.ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:8.2f} ms ({Q/dt/1e9:.2f} G/s)", flush=True)


for w in (1, 2, 4, 8):
    tab = jnp.asarray(rng.normal(size=(T, w)).astype(np.float32))
    f = jax.jit(lambda t, i: t[i])
    timed(f"gather ({T},{w})", f, tab, idx)

# int32 vs f32 rows
tab_i = jnp.asarray(rng.integers(0, 100, size=(T, 4)).astype(np.int32))
timed("gather int32 (T,4)", jax.jit(lambda t, i: t[i]), tab_i, idx)


def pallas_taa(tab1d, idxb, tiles):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, W = idxb.shape

    def kernel(tab_ref, idx_ref, out_ref):
        ix = idx_ref[:]
        acc = jnp.zeros(ix.shape, jnp.float32)
        for t in range(tiles):
            tile = tab_ref[t * 2048:(t + 1) * 2048]
            tile_b = jnp.broadcast_to(tile[None, :], ix.shape)
            loc = ix - t * 2048
            inb = (loc >= 0) & (loc < 2048)
            locc = jnp.clip(loc, 0, 2047)
            g = jnp.take_along_axis(tile_b, locc, axis=1)
            acc = jnp.where(inb, g, acc)
        out_ref[:] = acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(idxb.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, W), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        grid=(R // 8,),
    )(tab1d, idxb)


TILES = (T + 2047) // 2048
tab1 = jnp.asarray(rng.normal(size=(TILES * 2048,)).astype(np.float32))
idxb = idx.reshape(-1, 2048)
try:
    f = jax.jit(partial(pallas_taa, tiles=TILES))
    timed(f"pallas taa ({TILES} tiles)", f, tab1, idxb)
except Exception as e:
    print(f"pallas taa FAILED: {type(e).__name__}: {str(e)[:200]}")
