"""Pallas VMEM gather on chip — direct call (no outer jit/fori chain; the
chained wrapper hits a jax lowering-cache KeyError/RecursionError).
Timing: per-call dispatch incl. tunnel overhead, averaged over sequential
calls whose results are all read back at the end (queue executes in order).
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import naqs_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from naqs_tpu.ops.dyn_gather import table_gather2, pad_tables

T = 14408
tile_w = 2048
M, K = 8192, 794
rng = np.random.default_rng(0)
tab = np.stack([rng.normal(size=T + 1).astype(np.float32),
                rng.uniform(0, 2 * np.pi, T + 1).astype(np.float32)], 1)
la_t, ph_t = pad_tables(jnp.asarray(tab), T, tile_w, miss=-200.0)
idx = jnp.asarray(rng.integers(0, T, size=(M, K)).astype(np.int32))

xla = jax.jit(lambda ix: (jnp.take(la_t, ix), jnp.take(ph_t, ix)))

def bench(fn, name, n=10):
    la, ph = fn(idx)
    np.asarray(la[:1])  # warm-up + drain
    t0 = time.perf_counter()
    outs = [fn(idx) for _ in range(n)]
    np.asarray(outs[-1][0][:1])  # drain the in-order queue
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.2f} ms ({M*K/dt/1e9:.2f} G rows/s)", flush=True)
    return la, ph

la_x, ph_x = bench(xla, "xla gather")
try:
    la_p, ph_p = bench(
        lambda ix: table_gather2(la_t, ph_t, ix, tile_w=tile_w), "pallas")
    err = float(jnp.max(jnp.abs(la_p - la_x)) + jnp.max(jnp.abs(ph_p - ph_x)))
    print("max err:", err, flush=True)
except Exception as e:
    print("pallas failed:", type(e).__name__, str(e)[:300], flush=True)
