"""Bisect which jitted program hangs Li2O on the axon TPU.

Phases (each in its own subprocess, killed on timeout):
  sample   -- ancestral sampler at cap=16384
  eloc     -- sort-path local_energy at cap=16384
  eloc_rank-- rank-path local_energy (41.4M-row value table)
Usage: python scratch/probe_li2o_axon.py [phase]
"""
import os
import subprocess
import sys
import time

PHASES = ["sample", "eloc", "eloc_rank"]


def run_phase(phase):
    import numpy as np
    import jax
    import jax.numpy as jnp

    import naqs_tpu as nq
    from naqs_tpu.hamiltonian import PauliTerms
    from naqs_tpu.models.nade import NAQSConfig, log_psi
    from naqs_tpu.trainer import VMCTrainer, TrainConfig

    mol = nq.load_molecule("Li2O")
    h = nq.Hilbert.for_molecule(mol)
    with np.load("data/terms_cache/Li2O_terms.npz") as z:
        terms = PauliTerms(**{k: z[k] for k in z.files if k != "n_qubits"},
                           n_qubits=int(z["n_qubits"]))
    s = h.n_qubits // 2
    cfg = NAQSConfig(
        n_qubits=h.n_qubits, sectors=h.sectors,
        amp_hidden=(64,), phase_hidden=(512, 512), aggregate_phase=False,
        shell_order=tuple(range(s - 1, -1, -1)),
    )
    tc = TrainConfig(seed=11, n_unq_samples_max=16384)
    tr = VMCTrainer(cfg, terms, h, tc)
    cap = tr.capacity
    print(f"[{phase}] ready cap={cap}", flush=True)

    def drain(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]

    if phase == "sample":
        from naqs_tpu.sampler import sample
        t0 = time.perf_counter()
        b = sample(cfg, tr.params, jax.random.PRNGKey(0), jnp.float64(1e7), cap)
        drain(b)
        print(f"[{phase}] first call {time.perf_counter()-t0:.1f}s "
              f"unq={int(b.n_unique)}", flush=True)
        t0 = time.perf_counter()
        for _ in range(5):
            b = sample(cfg, tr.params, jax.random.PRNGKey(1), jnp.float64(1e7), cap)
        drain(b)
        print(f"[{phase}] {(time.perf_counter()-t0)/5*1e3:.0f} ms/call", flush=True)
        return

    from naqs_tpu.ops.local_energy import DeviceTerms, local_energy

    if phase == "eloc":
        os.environ["NAQS_TPU_RANK_MAX"] = str(1 << 24)  # too late for import-time
        import naqs_tpu.ops.rank as rank
        rank.RANK_SIZE_MAX = 1 << 24
    dt = DeviceTerms.from_terms(terms, hilbert=h)
    print(f"[{phase}] rank_spec={'None' if dt.rank_spec is None else 'on'}",
          flush=True)
    rng = np.random.default_rng(0)
    # synthetic sorted sample buffer
    m = 12000
    states = np.sort(rng.choice(2 ** 30, size=cap, replace=False).astype(np.uint64))
    # project onto valid states by sampling the basis lazily: use rank of
    # low-index basis states instead (cheap slice of the sector product)
    from naqs_tpu.utils.hilbert import _spin_combos
    aw = np.uint64(1) << (2 * np.arange(s, dtype=np.uint64))
    bw = aw << np.uint64(1)
    a = _spin_combos(s, h.sectors[0][0], aw)[:4000]
    b = _spin_combos(s, h.sectors[0][1], bw)[:4000]
    pool = (a[:, None] | b[None, :64]).ravel()
    sel = rng.choice(len(pool), size=m, replace=False)
    buf = np.full((cap,), np.uint64(2 ** 64 - 1), np.uint64)
    buf[:m] = np.sort(pool[sel])
    la = np.zeros(cap, np.float32)
    la[:m] = rng.normal(size=m) - 1.0
    ph = np.zeros(cap, np.float32)
    ph[:m] = rng.uniform(0, 2 * np.pi, size=m)
    f = jax.jit(lambda st, l, p: local_energy(dt, st, l, p, jnp.int32(m)))
    t0 = time.perf_counter()
    out = f(jnp.asarray(buf), jnp.asarray(la), jnp.asarray(ph))
    drain(out)
    print(f"[{phase}] first call {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        out = f(jnp.asarray(buf), jnp.asarray(la), jnp.asarray(ph))
    drain(out)
    print(f"[{phase}] {(time.perf_counter()-t0)/5*1e3:.0f} ms/call", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_phase(sys.argv[1])
    else:
        for ph in PHASES:
            print(f"--- {ph}", flush=True)
            try:
                r = subprocess.run(
                    [sys.executable, __file__, ph],
                    capture_output=True, text=True, timeout=1800,
                    env={**os.environ,
                         **({"NAQS_TPU_RANK_MAX": str(1 << 24)}
                            if ph == "eloc" else {})})
                tail = [l for l in (r.stdout + r.stderr).splitlines()
                        if l.strip()][-4:]
                print("\n".join(tail), flush=True)
            except subprocess.TimeoutExpired:
                print("TIMEOUT 1800s (hang)", flush=True)
