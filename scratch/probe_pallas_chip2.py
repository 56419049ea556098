"""Validate + time the Pallas VMEM table-gather on the real axon chip.

Compares table_gather2 against the plain XLA gather for the E_loc lookup
shape (N2 production: (M, Kxy) queries against a (14408,) table), timing by
chained jit + single readback (block_until_ready is a no-op on the tunnel).
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import naqs_tpu  # noqa: F401  (x64 + platform setup)
import jax
import jax.numpy as jnp
from naqs_tpu.ops.dyn_gather import table_gather2, pad_tables

print("backend:", jax.devices()[0].platform, flush=True)

T = 14408          # N2 sector + miss slot
tile_w = 2048
M, K = 8192, 794   # ~6.5M queries
rng = np.random.default_rng(0)
tab = np.stack([rng.normal(size=T + 1).astype(np.float32),
                rng.uniform(0, 2 * np.pi, T + 1).astype(np.float32)], 1)
la_t, ph_t = pad_tables(jnp.asarray(tab), T, tile_w, miss=-200.0)
idx = jnp.asarray(rng.integers(0, T, size=(M, K)).astype(np.int32))

def chain(fn, n):
    def f(ix):
        def body(_, c):
            la, ph = fn(ix)
            return c + 0.0 * (la[0, 0] + ph[0, 0])
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0)), fn(ix)
    return jax.jit(f)

def timed(fn, ix, n):
    out = fn(ix)
    np.asarray(out[0])
    t0 = time.perf_counter()
    out = fn(ix)
    r = np.asarray(out[0])
    return (time.perf_counter() - t0) / n, out[1]

n_it = 20
f_pl = chain(lambda ix: table_gather2(la_t, ph_t, ix, tile_w=tile_w), n_it)
f_xla = chain(lambda ix: (jnp.take(la_t, ix), jnp.take(ph_t, ix)), n_it)

t_xla, (la_x, ph_x) = timed(f_xla, idx, n_it)
print(f"xla gather: {t_xla*1e3:.2f} ms / {M*K/1e6:.1f}M rows "
      f"({M*K/t_xla/1e9:.2f} G rows/s)", flush=True)
t_pl, (la_p, ph_p) = timed(f_pl, idx, n_it)
print(f"pallas     : {t_pl*1e3:.2f} ms ({M*K/t_pl/1e9:.2f} G rows/s), "
      f"speedup {t_xla/t_pl:.2f}x", flush=True)
err = float(jnp.max(jnp.abs(la_p - la_x)) + jnp.max(jnp.abs(ph_p - ph_x)))
print("max err:", err, flush=True)
assert err == 0.0
print("OK", flush=True)
