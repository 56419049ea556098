"""Validate ops/dyn_gather.table_gather2 on the real axon TPU.

Compares the Pallas VMEM table gather against the plain XLA gather for
an N2-sized value table (14408 rows) and an O2-sized one (~25k rows),
at the engine's production query volume (M=8192 x Kxy~1k rows), and
times both with chained in-program iterations + one readback.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import naqs_tpu  # noqa: F401  (x64 + platform wiring)
from naqs_tpu.ops import dyn_gather


def bench(t_rows, q, tile_w=2048, iters=20):
    rng = np.random.default_rng(0)
    tpad = -(-t_rows // tile_w) * tile_w
    la = np.full(tpad, -200.0, np.float32)
    la[:t_rows] = rng.normal(size=t_rows).astype(np.float32)
    ph = np.zeros(tpad, np.float32)
    ph[:t_rows] = rng.uniform(0, 2 * np.pi, size=t_rows).astype(np.float32)
    idx = rng.integers(0, t_rows, size=q).astype(np.int32)
    la_j, ph_j, idx_j = jnp.asarray(la), jnp.asarray(ph), jnp.asarray(idx)

    # correctness
    out_la, out_ph = dyn_gather.table_gather2(la_j, ph_j, idx_j, tile_w=tile_w)
    ref_la, ref_ph = la[idx], ph[idx]
    err = max(float(np.abs(np.asarray(out_la) - ref_la).max()),
              float(np.abs(np.asarray(out_ph) - ref_ph).max()))
    print(f"T={t_rows} q={q}: max err {err}", flush=True)
    assert err == 0.0, err

    def chained_pallas(l, p, ix):
        def body(_, c):
            a, b = dyn_gather.table_gather2(l, p, ix + 0 * c[:1].astype(ix.dtype),
                                            tile_w=tile_w)
            return c + 0.0 * (a[:1] + b[:1])
        return jax.lax.fori_loop(0, iters, body, jnp.zeros(1, jnp.float32))

    def chained_xla(l, p, ix):
        def body(_, c):
            ixx = ix + 0 * c[:1].astype(ix.dtype)
            a, b = l[ixx], p[ixx]
            return c + 0.0 * (a[:1] + b[:1])
        return jax.lax.fori_loop(0, iters, body, jnp.zeros(1, jnp.float32))

    for name, fn in [("pallas", chained_pallas), ("xla", chained_xla)]:
        f = jax.jit(fn)
        np.asarray(f(la_j, ph_j, idx_j))  # compile+drain
        t0 = time.perf_counter()
        np.asarray(f(la_j, ph_j, idx_j))
        dt = (time.perf_counter() - t0) / iters
        print(f"  {name:6s} {dt*1e3:8.2f} ms/call  "
              f"{q/dt/1e9:.3f} G rows/s", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    bench(14408, 8192 * 1024)
    bench(25200, 8192 * 1024)
    bench(14408, 6_500_000)
