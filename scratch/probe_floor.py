"""Measure the tunnel's per-dispatch floor with a trivial jitted op."""
import time
import numpy as np
import jax, jax.numpy as jnp
import jax
jax.config.update("jax_compilation_cache_dir", "data/jax_cache")

x = jnp.zeros((8192,), jnp.float32)
f = jax.jit(lambda v: v + 1.0)
out = f(x); np.asarray(out[:1])
for n in (10, 30):
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(out)
    np.asarray(out[:1])
    print(f"n={n}: {(time.perf_counter()-t0)/n*1e3:.2f} ms/dispatch", flush=True)

# and a chained version inside ONE dispatch for comparison
g = jax.jit(lambda v: jax.lax.fori_loop(0, 30, lambda i, a: a + 1.0, v))
out = g(x); np.asarray(out[:1])
t0 = time.perf_counter()
out = g(x); np.asarray(out[:1])
print(f"fori30 single dispatch: {(time.perf_counter()-t0)*1e3:.2f} ms", flush=True)
