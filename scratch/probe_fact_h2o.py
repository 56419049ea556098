"""Factored engine on TPU at H2O 6-31G production shapes: time + verify."""
import time

import numpy as np
import jax
import jax.numpy as jnp

import naqs_tpu as nq
jax.config.update("jax_compilation_cache_dir", "data/jax_cache")
from naqs_tpu.hamiltonian import PauliTerms, local_energy_np
from naqs_tpu.ops.local_energy import DeviceTerms, local_energy

mol = nq.load_molecule("H2O_6-31G")
h = nq.Hilbert.for_molecule(mol)
with np.load("data/terms_cache/H2O_6-31G_terms.npz") as z:
    terms = PauliTerms(**{k: z[k] for k in z.files if k != "n_qubits"},
                       n_qubits=int(z["n_qubits"]))
t0 = time.time()
dt = DeviceTerms.from_terms(terms, hilbert=h)
print(f"from_terms {time.time()-t0:.1f}s dense={type(dt.dense).__name__}",
      flush=True)

CAP = 100000
M = 90000
rng = np.random.default_rng(0)
sub = np.sort(rng.choice(h.size, size=M, replace=False))
buf = np.full((CAP,), np.uint64(2**64 - 1), np.uint64)
buf[:M] = h.basis[sub]
la = np.zeros(CAP, np.float32)
la[:M] = rng.normal(size=M) - 1.0
ph = np.zeros(CAP, np.float32)
ph[:M] = rng.uniform(0, 2 * np.pi, size=M)
s_d, la_d, ph_d = jnp.asarray(buf), jnp.asarray(la), jnp.asarray(ph)

N_IT = 5
def chain(s, a, p):
    def body(_, a_c):
        e_re, e_im = local_energy(dt, s, a_c, p, jnp.int32(M))
        return a_c + 0.0 * (jnp.nan_to_num(e_re)
                            + jnp.nan_to_num(e_im)).astype(jnp.float32)
    return jax.lax.fori_loop(0, N_IT, body, a)

f = jax.jit(chain)
t0 = time.time()
out = f(s_d, la_d, ph_d); np.asarray(out[:1])
print(f"first chained call (compile+run) {time.time()-t0:.1f}s", flush=True)
best = float("inf")
for _ in range(4):
    t0 = time.perf_counter()
    out = f(s_d, la_d, ph_d); np.asarray(out[:1])
    best = min(best, (time.perf_counter() - t0) / N_IT)
print(f"factored E_loc: {best*1e3:.1f} ms/call (min of 4 runs)", flush=True)

# correctness vs numpy oracle on a 512-row prefix
f1 = jax.jit(lambda s, a, p: local_energy(dt, s, a, p, jnp.int32(M)))
e_re, e_im = f1(s_d, la_d, ph_d)
k = 512
psi = np.exp(la[:M].astype(np.float64) + 1j * ph[:M].astype(np.float64))
e_np = local_energy_np(terms, buf[:M], psi, queries=np.arange(k)) \
    if "queries" in local_energy_np.__code__.co_varnames else None
if e_np is None:
    e_np = local_energy_np(terms, buf[:k], psi[:k])
    # NOTE: oracle truncated to its own 512-state set -> only compare
    # diagonal-dominated magnitude loosely; do the exact check on a small
    # self-contained subset instead
    m2 = 1500
    buf2 = buf.copy(); buf2[m2:] = np.uint64(2**64 - 1)
    e2_re, e2_im = jax.jit(
        lambda s, a, p: local_energy(dt, s, a, p, jnp.int32(m2)))(
            jnp.asarray(buf2), la_d, ph_d)
    e_np2 = local_energy_np(terms, buf2[:m2], psi[:m2])
    err = np.abs(np.asarray(e2_re)[:m2] - e_np2.real).max()
    err_i = np.abs(np.asarray(e2_im)[:m2] - e_np2.imag).max()
    print(f"oracle check (m={m2}): max err re={err:.2e} im={err_i:.2e}",
          flush=True)
    assert err < 1e-3 and err_i < 1e-3
print("OK", flush=True)
