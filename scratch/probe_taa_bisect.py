"""Bisect which Mosaic dynamic-gather (take_along_axis) shapes the axon
compiler accepts, and time the survivors.

Each variant runs in its own subprocess (a Mosaic crash kills only that
probe). Usage: python scratch/probe_taa_bisect.py            # run all
       python scratch/probe_taa_bisect.py <name>             # one variant
"""
import subprocess
import sys
import time

VARIANTS = [
    # name, rows, width(table lanes per block), tiles, grid_rows
    ("vreg_8x128", 8, 128, 1, 8),
    ("row_8x256", 8, 256, 1, 8),
    ("row_8x512", 8, 512, 1, 8),
    ("row_8x1024", 8, 1024, 1, 8),
    ("row_8x2048", 8, 2048, 1, 8),
    ("tiled_2048x2", 8, 2048, 2, 8),
    ("tiled_2048x8", 8, 2048, 8, 8),
    ("big_256x2048x8", 256, 2048, 8, 256),
]


def run_variant(name):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cfg = {v[0]: v for v in VARIANTS}[name]
    _, rows, width, tiles, block_rows = cfg
    T = width * tiles
    Q_TARGET = 8192 * 800
    n_blocks = max(1, Q_TARGET // (block_rows * width))
    R = n_blocks * block_rows

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(8, T)).astype(np.float32))
    idx = jnp.asarray(
        rng.integers(0, T, size=(R, width)).astype(np.int32))

    def kernel(tab_ref, idx_ref, out_ref):
        ix = idx_ref[:]
        acc = jnp.zeros(ix.shape, jnp.float32)
        for t in range(tiles):
            tile = tab_ref[:, t * width:(t + 1) * width]  # (8, width)
            tile_b = jnp.broadcast_to(
                tile[:1], ix.shape) if ix.shape[0] != 8 else tile
            loc = ix - t * width
            inb = (loc >= 0) & (loc < width)
            locc = jnp.clip(loc, 0, width - 1)
            g = jnp.take_along_axis(tile_b, locc, axis=1)
            acc = jnp.where(inb, g, acc)
        out_ref[:] = acc

    f = jax.jit(lambda tab, idx: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((block_rows, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        grid=(R // block_rows,),
    )(tab, idx))

    out = f(tab, idx)
    np.asarray(out.ravel()[0])
    # correctness
    exp = np.asarray(tab)[0][np.asarray(idx)]
    got = np.asarray(out)
    err = np.abs(exp - got).max()
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(tab, idx)
    np.asarray(out.ravel()[0])
    dt = (time.perf_counter() - t0) / 10
    print(f"OK {name}: err={err:.1e}  {dt*1e3:.2f} ms "
          f"({R*width/dt/1e9:.2f} G/s)", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_variant(sys.argv[1])
    else:
        for v in VARIANTS:
            name = v[0]
            print(f"--- {name}", flush=True)
            try:
                r = subprocess.run(
                    [sys.executable, __file__, name],
                    capture_output=True, text=True, timeout=1500)
            except subprocess.TimeoutExpired:
                print("TIMEOUT (compile hang or service contention)",
                      flush=True)
                continue
            out = (r.stdout + r.stderr).strip().splitlines()
            keep = [l for l in out if "OK " in l or "Error" in l
                    or "error" in l.lower()][-3:]
            print("\n".join(keep) if keep else f"rc={r.returncode} (no output)",
                  flush=True)
