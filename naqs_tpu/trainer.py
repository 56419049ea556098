"""VMC training: surrogate loss, optimizer stack, adaptive sample controller.

Re-implements the reference optimizer layer (src/optimizer/energy.py:43-1056)
as two jitted device functions (sample, update) orchestrated by a thin host
controller:

  * surrogate loss 2 * sum_s w_s [log|psi| * Re(dE) + arg(psi) * Im(dE)]
    with dE = E_loc - <E_loc> stop-gradded (energy.py:328-329),
  * count-based or |psi|^2 sample weighting (energy.py:989-993),
  * optax Adam (betas 0.9/0.99, eps 1e-15) + two-phase LR schedule
    (experiments/_base.py:228,309-320),
  * adaptive trailing-mean gradient clipping (energy.py:383-395) as an
    optax transform (off by default, matching production),
  * the adaptive sample-count controller: x10 when too few unique samples,
    /10 on too many or capacity overflow (energy.py:936-971),
  * exact-energy evaluation over the full restricted basis, sampled-subspace
    FCI refinement (solve_H, energy.py:762-786), pre-flatten / pre-train
    warm starts (energy.py:788-900).
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from naqs_tpu.hamiltonian import PauliTerms, assemble_sparse_hamiltonian_np
from naqs_tpu.models.nade import NAQSConfig, init_params, log_psi
from naqs_tpu.ops.local_energy import DeviceTerms, local_energy, quadratic_energy
from naqs_tpu.sampler import SampleBatch, sample, sample_density
from naqs_tpu.utils.hilbert import Hilbert


class _heartbeat:
    """Context manager printing a keep-alive line every `interval` seconds
    from a daemon thread. Long host-side solves (Li2O CISDTQ: ~9 min
    assemble + ~18 min eigsh) are otherwise silent, and the fleet's
    output-activity watchdog would kill the run mid-eigensolve."""

    def __init__(self, msg: str, interval: float = 120.0):
        self.msg, self.interval = msg, interval

    def __enter__(self):
        import threading

        self._stop = threading.Event()
        t0 = time.time()

        def loop():
            while not self._stop.wait(self.interval):
                print(f"{self.msg} ({time.time() - t0:.0f}s elapsed)",
                      flush=True)

        self._th = threading.Thread(target=loop, daemon=True)
        self._th.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        return False


# ------------------------------------------------------------ optax transform

def adaptive_trailing_clip(factor: float, memory: int = 50, init_max: float = 1e3):
    """Clip global grad norm to `factor` x trailing mean of past clipped norms.

    Port of the reference's deque-based clipper (energy.py:383-395).
    """

    def init_fn(params):
        del params
        return {
            "norms": jnp.zeros((memory,), jnp.float32),
            "count": jnp.zeros((), jnp.int32),
        }

    def update_fn(updates, state, params=None):
        del params
        norm = optax.global_norm(updates).astype(jnp.float32)
        have = jnp.minimum(state["count"], memory)
        mean = jnp.where(
            have > 0, jnp.sum(state["norms"]) / jnp.maximum(have, 1), init_max / factor
        )
        max_norm = factor * mean
        scale = jnp.where(norm > max_norm, max_norm / (norm + 1e-12), 1.0)
        updates = jax.tree_util.tree_map(lambda g: g * scale, updates)
        slot = state["count"] % memory
        norms = state["norms"].at[slot].set(jnp.minimum(norm, max_norm))
        return updates, {"norms": norms, "count": state["count"] + 1}

    return optax.GradientTransformation(init_fn, update_fn)


def log_psi_table(cfg: NAQSConfig, params, states: jnp.ndarray,
                  chunk: int = 65536):
    """log_psi over a large SENTINEL-padded state buffer, chunked with
    lax.map so peak activation memory stays O(chunk) (the full H2O 6-31G
    sector is 1.66M rows; one unchunked phase-net pass would materialize
    a multi-GB (rows, 512) activation). `states.shape[0]` must be a
    multiple of `chunk` (callers pad at construction time)."""
    n = states.shape[0]
    if n <= chunk:
        return log_psi(cfg, params, states)
    assert n % chunk == 0, "table buffer must be pre-padded to chunk multiple"
    la, ph = jax.lax.map(
        lambda s: log_psi(cfg, params, s), states.reshape(n // chunk, chunk))
    return la.reshape(-1), ph.reshape(-1)


@dataclass(frozen=True)
class TrainConfig:
    n_train: int = 5000
    lr: float = 1e-3
    lr_final: float = 5e-4          # second-phase LR (reference default schedule)
    lr_lut: float = 1e-2            # separate LR for LUT-conditional tables
    use_lr_schedule: bool = True
    adam_b1: float = 0.9
    adam_b2: float = 0.99
    adam_eps: float = 1e-15
    grad_clip_factor: Optional[float] = None
    grad_clip_memory: int = 50
    n_samples: float = 1e6
    n_samples_max: float = 1e12
    n_unq_samples_min: int = 1000
    n_unq_samples_max: int = 4096   # also the device buffer capacity
    reweight_by_psi: bool = False
    # tempered ancestral sampling: draw from per-shell conditionals p^beta
    # (beta < 1 widens support into the |psi|^2 tail). Requires
    # reweight_by_psi for unbiased expectations — the cli enforces this.
    # Targets the measured from-scratch stall mechanism (tail amplitude
    # gradient starvation, docs/ENGINE_NOTES.md round-5 anatomy section).
    sample_beta: float = 1.0
    # exact local energies: evaluate psi over the ENTIRE enumerated sector
    # each step (one chunked MXU pass) and resolve every coupled state
    # against that table, instead of truncating psi(s') = 0 for unsampled
    # states (the reference's semantics, energy.py:247-248). Removes the
    # truncation bias AND restores the zero-variance principle (E_loc is
    # constant at an eigenstate only when computed exactly), at the cost of
    # a full-sector forward per step — affordable on TPU up to ~64M states.
    exact_eloc: bool = False
    eloc_fwd_chunk: int = 65536     # rows per table-forward chunk
    use_sr: bool = False            # stochastic-reconfiguration natural gradient
    sr_damping: float = 1e-3
    sr_cg_iters: int = 50
    sr_kl_clip: Optional[float] = None  # trust-region cap on dx^T S dx
    sr_fisher_mix: float = 0.0      # uniform-support mixing in the metric
    use_kfac: bool = False          # Kronecker-factored natural gradient
    kfac_damping: float = 1e-2
    kfac_decay: float = 0.95
    kfac_kl_clip: float = 1e-3
    seed: int = 0

    def make_optimizer(self, has_lut: bool = False) -> optax.GradientTransformation:
        if self.use_lr_schedule:
            half = max(self.n_train // 2, 1)
            sched = optax.join_schedules(
                [optax.constant_schedule(self.lr), optax.constant_schedule(self.lr_final)],
                boundaries=[half],
            )
        else:
            sched = self.lr
        adam = lambda lr: optax.adam(
            lr, b1=self.adam_b1, b2=self.adam_b2, eps=self.adam_eps
        )
        if has_lut:
            # separate learning-rate group for LUT tables (reference param
            # groups, wavefunction.py:416-437 / _base.py:228)
            def labels(params):
                return {
                    k: jax.tree_util.tree_map(
                        lambda _: "lut" if k.startswith("lut") else "mlp", v
                    )
                    for k, v in params.items()
                }

            base = optax.multi_transform(
                {"mlp": adam(sched), "lut": adam(self.lr_lut)}, labels
            )
        else:
            base = adam(sched)
        chain = []
        if self.grad_clip_factor is not None:
            chain.append(
                adaptive_trailing_clip(self.grad_clip_factor, self.grad_clip_memory)
            )
        chain.append(base)
        return optax.chain(*chain)


# ------------------------------------------------------------- device kernels

def _vmc_update_impl(
    cfg: NAQSConfig,
    optimizer,
    params,
    opt_state,
    dt: DeviceTerms,
    batch: SampleBatch,
    reweight_by_psi: bool = False,
    table=None,
    fwd_chunk: int = 65536,
):
    """One SGD step on a sampled batch. Returns (params, opt_state, metrics).

    With `table=(t_states, t_n)` (a SENTINEL-padded enumeration of the full
    restricted sector), local energies are EXACT: psi is evaluated over the
    whole sector (log_psi_table) and coupled states resolve against that
    table, so no psi(s') is ever truncated to zero. Without it, psi(s') is
    resolved against the sampled batch itself (the reference's truncated
    estimator, energy.py:247-248)."""
    live = jnp.arange(batch.states.shape[0]) < batch.n_unique
    t_vals = None
    if table is not None:
        # no gradient flows through E_loc; evaluate the sector table once
        # outside the autodiff region
        t_states, t_n = table
        t_vals = jax.lax.stop_gradient(
            log_psi_table(cfg, params, t_states, fwd_chunk))

    def loss_fn(p):
        la, ph = log_psi(cfg, p, batch.states)
        la_d, ph_d = jax.lax.stop_gradient((la, ph))
        if reweight_by_psi:
            w = jnp.where(live, jnp.exp(2.0 * la_d.astype(jnp.float64)), 0.0)
        else:
            w = jnp.where(live, batch.counts, 0.0)
        # guard the empty-batch case (n_unique == 0): 0/0 weights would
        # poison params with NaN permanently; 0-weights make the step a no-op
        w = w / jnp.maximum(jnp.sum(w), 1e-300)
        if t_vals is not None:
            e_re, e_im = local_energy(
                dt, t_states, t_vals[0], t_vals[1], t_n,
                queries=(batch.states, la_d, ph_d))
        else:
            e_re, e_im = local_energy(dt, batch.states, la_d, ph_d,
                                      batch.n_unique)
        e_re = jnp.where(live, e_re, 0.0)
        e_im = jnp.where(live, e_im, 0.0)
        e_mean = jnp.sum(w * e_re)
        e_mean_im = jnp.sum(w * e_im)
        e_var = jnp.sum(w * (e_re - e_mean) ** 2)
        d_re = jax.lax.stop_gradient(e_re - e_mean).astype(jnp.float32)
        d_im = jax.lax.stop_gradient(e_im - e_mean_im).astype(jnp.float32)
        wf = w.astype(jnp.float32)
        loss = 2.0 * jnp.sum(wf * (la * d_re + ph * d_im))
        return loss, (e_mean, e_var)

    (loss, (e_mean, e_var)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    grad_norm = optax.global_norm(grads)
    updates, new_opt_state = optimizer.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    # withhold the update when (a) the batch overflowed capacity (truncated =>
    # biased), or (b) anything went non-finite (one NaN gradient would poison
    # params and the Adam moments PERMANENTLY — observed on stretched N2)
    bad = (batch.overflow
           | ~jnp.isfinite(loss)
           | ~jnp.isfinite(grad_norm)
           | ~jnp.isfinite(e_mean))
    keep = lambda new, old: jax.tree_util.tree_map(
        lambda n, o: jnp.where(bad, o, n), new, old
    )
    params = keep(new_params, params)
    opt_state = keep(new_opt_state, opt_state)
    metrics = {
        "e_loc": e_mean,
        "e_loc_var": e_var,
        "loss": loss,
        "grad_norm": grad_norm,
    }
    return params, opt_state, metrics


vmc_update = partial(jax.jit, static_argnames=("cfg", "optimizer",
                                               "reweight_by_psi",
                                               "fwd_chunk"))(
    _vmc_update_impl)


@partial(jax.jit, static_argnames=("cfg", "optimizer", "reweight_by_psi",
                                   "length"))
def vmc_update_scan(
    cfg: NAQSConfig,
    optimizer,
    params,
    opt_state,
    dt: DeviceTerms,
    batch: SampleBatch,
    n_live,
    reweight_by_psi: bool = True,
    length: int = 25,
):
    """`length` SGD steps on one static batch in a SINGLE dispatch.

    Exact-mode training re-uses the same full-basis batch every step, so the
    whole flush window scans on-device and the host reads back ONE
    (length, 2) metrics buffer — over the tunneled TPU a small fresh scalar
    readback costs ~1.7 s while a fixed-shape buffer is ~37 ms (CLAUDE.md),
    so this turns the measured 0.54 s/step exact wall time into ~the pure
    18 ms/step device time. `n_live` (traced) masks trailing steps to
    no-ops so one compiled program serves every partial window (resumes
    land on arbitrary step counts)."""

    def body(carry, i):
        params, opt_state = carry
        new_p, new_o, m = _vmc_update_impl(
            cfg, optimizer, params, opt_state, dt, batch, reweight_by_psi)
        on = i < n_live
        params = jax.tree_util.tree_map(
            lambda n, o: jnp.where(on, n, o), new_p, params)
        opt_state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(on, n, o), new_o, opt_state)
        return (params, opt_state), jnp.stack(
            [m["e_loc"], m["e_loc_var"]])

    (params, opt_state), ms = jax.lax.scan(
        body, (params, opt_state), jnp.arange(length))
    return params, opt_state, ms


@partial(jax.jit, static_argnames=("cfg",))
def exact_energy(cfg: NAQSConfig, params, dt: DeviceTerms, basis: jnp.ndarray):
    """Exact <psi|H|psi>/<psi|psi> over the full restricted basis
    (reference calculate_energy, energy.py:189-217). Uses the symmetric
    quadratic form, overflow-safe for untrained amplitude ranges."""
    la, ph = log_psi(cfg, params, basis)
    return quadratic_energy(dt, basis, la, ph, jnp.int32(basis.shape[0]))


def make_pre_flatten_step(cfg: NAQSConfig, optimizer):
    """MSE of log-amplitudes to log(1/sqrt(|basis|)) (pre_flatten,
    energy.py:840-900). Returns a jitted (params, opt, states, target)->... fn."""

    @jax.jit
    def step(params, opt_state, states, target):
        def loss_fn(p):
            la, _ = log_psi(cfg, p, states)
            return jnp.mean((la - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def make_pre_train_step(cfg: NAQSConfig, optimizer):
    """Binary-cross-entropy of amplitudes to targets on given states
    (pre_train towards e.g. the HF state; energy.py:788-838)."""

    @jax.jit
    def step(params, opt_state, states, target_amp):
        def loss_fn(p):
            la, _ = log_psi(cfg, p, states)
            # BCE computed in LOG space: clipping exp(la) to [1e-7, ...]
            # zeroes the gradient whenever the amplitude is small -- and a
            # fresh deep NADE (e.g. 28 shells for cc-pVTZ) starts every
            # state at exp(la) ~ e^-21, making the pretrain a no-op
            la = jnp.minimum(la, -1e-7)
            bce = -(target_amp * la
                    + (1 - target_amp) * jnp.log1p(-jnp.exp(la)))
            return jnp.mean(bce)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


# --------------------------------------------------------------- host control

class VMCTrainer:
    """Host-side training controller (reference PartialSamplingOptimizer.run,
    energy.py:902-1056): drives the jitted sample/update kernels, adapts the
    sample count, logs metrics, checkpoints."""

    def __init__(
        self,
        model_cfg: NAQSConfig,
        terms: PauliTerms,
        hilbert: Hilbert,
        train_cfg: TrainConfig = TrainConfig(),
        save_loc: Optional[str] = None,
        n_devices: int = 1,
        train_terms: Optional[PauliTerms] = None,
    ):
        self.cfg = model_cfg
        self.tc = train_cfg
        self.hilbert = hilbert
        self.terms = terms
        # `train_terms` (when given) is the TRAINING operator — e.g.
        # H + lam * S^2 for spin-penalty runs (utils/spin.penalized_termdict).
        # `terms` stays the physical H: solve_h / warm starts assemble from
        # it, and exact_energy() reports pure <H> via dt_h.
        self.dt = DeviceTerms.from_terms(
            terms if train_terms is None else train_terms, hilbert=hilbert)
        self.dt_h = (self.dt if train_terms is None
                     else DeviceTerms.from_terms(terms, hilbert=hilbert))
        self.optimizer = train_cfg.make_optimizer(has_lut=model_cfg.num_lut > 0)
        self.key = jax.random.key(train_cfg.seed)
        self.key, k0 = jax.random.split(self.key)
        self.params = init_params(k0, model_cfg)
        self.opt_state = self.optimizer.init(self.params)
        self.n_samples = float(train_cfg.n_samples)
        self.capacity = int(train_cfg.n_unq_samples_max)
        self.n_devices = int(n_devices)
        # exact-E_loc sector table: the full sorted basis, SENTINEL-padded
        # to a chunk multiple so log_psi_table's lax.map has static shapes
        self._table = None
        if train_cfg.exact_eloc:
            from naqs_tpu.utils.bits import SENTINEL

            if train_cfg.use_kfac or (train_cfg.use_sr and n_devices > 1):
                raise ValueError(
                    "exact_eloc is implemented for the Adam update paths "
                    "and single-chip SR")
            basis = hilbert.basis
            chunk = int(train_cfg.eloc_fwd_chunk)
            n = len(basis)
            nd = max(1, int(n_devices))
            # pad so the buffer splits evenly into per-chip slices that are
            # themselves chunk multiples (sharded table forward)
            unit = chunk * nd if n > chunk else nd
            n_pad = -(-n // unit) * unit
            buf = np.full((n_pad,), SENTINEL, dtype=np.uint64)
            buf[:n] = basis
            self._table = (jnp.asarray(buf), jnp.int32(n))
        self.kfac_state = None
        self._sharded_step = None
        self._sharded_sr_step = None
        if train_cfg.use_sr and train_cfg.use_kfac:
            raise ValueError("use_sr and use_kfac are mutually exclusive")
        self._sharded_kfac_step = None
        if self.n_devices > 1:
            from naqs_tpu.parallel import (
                make_mesh, make_sharded_kfac_step, make_sharded_sr_step,
                make_sharded_train_step,
            )

            mesh = make_mesh(jax.devices()[: self.n_devices])
            cap_per_dev = max(64, self.capacity // self.n_devices)
            if train_cfg.use_sr:
                self._sharded_sr_step = make_sharded_sr_step(
                    model_cfg, mesh, cap_per_dev,
                    cg_iters=train_cfg.sr_cg_iters,
                    reweight_by_psi=train_cfg.reweight_by_psi,
                    kl_clip=train_cfg.sr_kl_clip,
                    fisher_mix=train_cfg.sr_fisher_mix,
                )
            elif train_cfg.use_kfac:
                self._sharded_kfac_step = make_sharded_kfac_step(
                    model_cfg, mesh, cap_per_dev
                )
            else:
                self._sharded_step = make_sharded_train_step(
                    model_cfg, self.optimizer, mesh, cap_per_dev,
                    table=self._table,
                    fwd_chunk=int(train_cfg.eloc_fwd_chunk),
                    reweight_by_psi=train_cfg.reweight_by_psi,
                    sample_beta=train_cfg.sample_beta,
                )
        self.n_steps = 0
        self.run_time = 0.0
        self.save_loc = save_loc
        self.log = {
            "E": [], "E_LOC": [], "E_LOC_VAR": [], "N_UNIQUE_SAMP": [], "TIME": [],
        }
        # cross-step sampled-state multiplicity counter feeding solve_h's
        # top-k subspace (reference Counter at energy.py:137,300,762-786)
        self.sampled_counter: dict[int, float] = {}
        self.d_p = 1e-8  # density-sampling threshold (run_density)
        # (E0, n_states) of the last solve_H warm start; persisted so a
        # resumed run can still report the (deterministic) subspace CI
        # instead of silently falling back to the counter top-k
        self.ws_result: Optional[tuple] = None
        # sample-count-controller hysteresis: the smallest n_samples that
        # recently overflowed the capacity buffer, and when. Without it a
        # wavefunction whose frontier overflows at 10*n but undershoots the
        # unique window at n thrashes grow->overflow->shrink every step,
        # doubling step cost (each overflow is a wasted sample+update
        # dispatch). Growth past the known-overflow point is only re-tried
        # every OVF_RETRY_STEPS steps (the distribution moves as training
        # progresses, so the boundary must be re-probed eventually).
        self._ovf_n = float("inf")
        self._ovf_step = -(10 ** 9)

    OVF_RETRY_STEPS = 50

    def _note_overflow(self):
        self._ovf_n = min(self._ovf_n, self.n_samples)
        self._ovf_step = self.n_steps

    def _grow_blocked(self) -> bool:
        """True if growing n_samples x10 would hit a recently-seen overflow."""
        return (self.n_samples * 10 >= self._ovf_n
                and self.n_steps - self._ovf_step < self.OVF_RETRY_STEPS)

    # recording every step costs a device->host transfer over the (high-
    # latency) tunnel; the top-k-most-sampled statistic is insensitive to
    # subsampling, so record every few steps
    RECORD_FREQ = 5
    # bound counter memory on long large-window runs: prune to the top half
    # when it exceeds this many distinct states (solve_h only ever uses the
    # top-k_max, so dropping the long low-count tail is loss-free in practice)
    COUNTER_MAX = 2_000_000

    def _record_samples(self, batch: SampleBatch, n_unq: Optional[int] = None):
        if self.n_steps % self.RECORD_FREQ:
            return
        nu = int(batch.n_unique) if n_unq is None else n_unq
        # device->host transfer of the FIXED-shape buffers, slice on host: a
        # device-side [:nu] slice has a new shape every step, and on the
        # tunneled TPU every distinct dispatched op costs a remote compile
        states = np.asarray(batch.states)[:nu]
        counts = np.asarray(batch.counts)[:nu]
        self._record_arrays(states, counts)

    def _record_arrays(self, states: np.ndarray, counts: np.ndarray):
        get = self.sampled_counter.get
        for s, c in zip(states.tolist(), counts.tolist()):
            self.sampled_counter[s] = get(s, 0.0) + c
        if len(self.sampled_counter) > self.COUNTER_MAX:
            keys = np.fromiter(self.sampled_counter.keys(), dtype=np.uint64,
                               count=len(self.sampled_counter))
            vals = np.fromiter(self.sampled_counter.values(), dtype=np.float64,
                               count=len(self.sampled_counter))
            keep = np.argpartition(vals, -self.COUNTER_MAX // 2)[
                -self.COUNTER_MAX // 2:]
            self.sampled_counter = dict(
                zip(keys[keep].tolist(), vals[keep].tolist())
            )

    # -- sampling with the reference's adaptive batch-size controller
    def get_samples(self, max_retries: int = 12) -> SampleBatch:
        last_action = 0
        for _ in range(max_retries):
            self.key, k = jax.random.split(self.key)
            batch = sample(
                self.cfg, self.params, k, jnp.float64(self.n_samples),
                self.capacity, beta=self.tc.sample_beta,
            )
            # one round-trip for both controller scalars (tunnel latency)
            n_unq_d, overflow = jax.device_get((batch.n_unique, batch.overflow))
            overflow = bool(overflow)
            n_unq = int(n_unq_d) if not overflow else self.capacity + 1
            action = -1 if overflow else 0
            at_min = self.n_samples <= self.tc.n_unq_samples_min
            at_max = self.n_samples >= self.tc.n_samples_max
            if (not at_min and not at_max) or overflow:
                if (n_unq < self.tc.n_unq_samples_min and last_action >= 0
                        and not overflow and not self._grow_blocked()):
                    action = 1
                    self.n_samples = min(self.n_samples * 10, self.tc.n_samples_max)
                elif (n_unq > self.tc.n_unq_samples_max and last_action <= 0) or overflow:
                    action = -1
                    if overflow:
                        self._note_overflow()
                    self.n_samples = max(self.n_samples / 10, self.tc.n_unq_samples_min)
            if action == 0:
                return batch
            last_action = action
        raise RuntimeError(
            "sample-count controller did not converge: capacity "
            f"{self.capacity} too small for this wavefunction's support?"
        )

    def _step_fused(self, max_retries: int = 12) -> dict:
        """Single-sync Adam step: sample and update are dispatched back-to-
        back and ONE host readback returns all controller/metric scalars.
        vmc_update withholds the update on capacity overflow, so the
        controller can back off and resample without an intermediate sync;
        unique-count window adjustments apply to the NEXT step (one-step lag
        vs the reference's get_samples, which is cost control, not bias).

        Over the tunneled TPU each sync costs ~10-30 ms of latency; this
        path halves the per-step sync count of the classic
        get_samples -> update sequence."""
        t0 = time.time()
        self.key, k = jax.random.split(self.key)
        batch = sample(
            self.cfg, self.params, k, jnp.float64(self.n_samples),
            self.capacity, beta=self.tc.sample_beta,
        )
        params, opt_state, metrics = vmc_update(
            self.cfg, self.optimizer, self.params, self.opt_state,
            self.dt, batch, self.tc.reweight_by_psi,
            table=self._table, fwd_chunk=self.tc.eloc_fwd_chunk,
        )
        e_loc, e_var, n_unq, ovf = jax.device_get(
            (metrics["e_loc"], metrics["e_loc_var"], batch.n_unique,
             batch.overflow)
        )
        if bool(ovf):
            # back off with SAMPLE-ONLY probes: the fused update was
            # computed-then-withheld once already; re-dispatching the full
            # update per retry doubles the wasted engine work (round-3
            # VERDICT weak #6). Probe like get_samples, then run the one
            # update on the batch that fits.
            for _ in range(max_retries):
                self._note_overflow()
                self.n_samples = max(self.n_samples / 10,
                                     self.tc.n_unq_samples_min)
                self.key, k = jax.random.split(self.key)
                batch = sample(
                    self.cfg, self.params, k, jnp.float64(self.n_samples),
                    self.capacity, beta=self.tc.sample_beta,
                )
                if not bool(jax.device_get(batch.overflow)):
                    break
            else:
                raise RuntimeError(
                    "sample-count controller did not converge: capacity "
                    f"{self.capacity} too small for this wavefunction's "
                    "support?"
                )
            params, opt_state, metrics = vmc_update(
                self.cfg, self.optimizer, self.params, self.opt_state,
                self.dt, batch, self.tc.reweight_by_psi,
                table=self._table, fwd_chunk=self.tc.eloc_fwd_chunk,
            )
            e_loc, e_var, n_unq, ovf = jax.device_get(
                (metrics["e_loc"], metrics["e_loc_var"], batch.n_unique,
                 batch.overflow)
            )
            assert not bool(ovf)
        self.params, self.opt_state = params, opt_state
        n_unq = int(n_unq)
        at_max = self.n_samples >= self.tc.n_samples_max
        at_min = self.n_samples <= self.tc.n_unq_samples_min
        if (n_unq < self.tc.n_unq_samples_min and not at_max
                and not self._grow_blocked()):
            self.n_samples = min(self.n_samples * 10, self.tc.n_samples_max)
        elif n_unq > self.tc.n_unq_samples_max and not at_min:
            self.n_samples = max(self.n_samples / 10, self.tc.n_unq_samples_min)
        self._record_samples(batch, n_unq)
        self.n_steps += 1
        dt_step = time.time() - t0
        self.run_time += dt_step
        out = {
            "e_loc": float(e_loc),
            "e_loc_var": float(e_var),
            "n_unique": n_unq,
            "n_samples": self.n_samples,
            "time": dt_step,
        }
        self.log["E_LOC"].append((self.n_steps, out["e_loc"]))
        self.log["E_LOC_VAR"].append((self.n_steps, out["e_loc_var"]))
        self.log["N_UNIQUE_SAMP"].append((self.n_steps, out["n_unique"]))
        self.log["TIME"].append((self.n_steps, self.run_time))
        return out

    def _step_sharded(self, max_retries: int = 12) -> dict:
        """Multi-chip step: per-shard sampling + psum'd update, with the
        sample-count controller applied from the returned metrics.

        On capacity overflow the device step withholds the (biased) update;
        the controller backs off n_samples and resamples before counting a
        step — the same semantics as the single-chip get_samples path."""
        t0 = time.time()
        for _ in range(max_retries):
            self.key, k = jax.random.split(self.key)
            keys = jax.random.split(k, self.n_devices)
            if self._sharded_sr_step is not None:
                self.params, metrics = self._sharded_sr_step(
                    self.params, self.dt, keys, jnp.float64(self.n_samples),
                    jnp.float64(self._current_lr()),
                    jnp.float64(self.tc.sr_damping),
                )
            elif self._sharded_kfac_step is not None:
                from naqs_tpu.kfac import kfac_init

                if self.kfac_state is None:
                    self.kfac_state = kfac_init(self.params)
                self.params, self.kfac_state, metrics = (
                    self._sharded_kfac_step(
                        self.params, self.kfac_state, self.dt, keys,
                        jnp.float64(self.n_samples),
                        jnp.float32(self._current_lr()),
                        jnp.float32(self.tc.kfac_damping),
                        jnp.float32(self.tc.kfac_decay),
                        jnp.float32(self.tc.kfac_kl_clip),
                    )
                )
            else:
                self.params, self.opt_state, metrics = self._sharded_step(
                    self.params, self.opt_state, self.dt, keys,
                    jnp.float64(self.n_samples),
                )
            if not bool(metrics["overflow"]):
                break
            self._note_overflow()
            self.n_samples = max(self.n_samples / 10, self.tc.n_unq_samples_min)
        else:
            raise RuntimeError(
                "sharded sample-count controller did not converge: capacity "
                f"{self.capacity} too small for this wavefunction's support?"
            )
        n_unq = int(metrics["n_unique"])
        if (n_unq < self.tc.n_unq_samples_min
                and self.n_samples < self.tc.n_samples_max
                and not self._grow_blocked()):
            self.n_samples = min(self.n_samples * 10, self.tc.n_samples_max)
        elif n_unq > self.tc.n_unq_samples_max:
            self.n_samples = max(self.n_samples / 10, self.tc.n_unq_samples_min)
        # feed the solve_h history counter from the merged (all-gathered)
        # sample buffer the sharded step already produced
        if self.n_steps % self.RECORD_FREQ == 0:
            nv = int(metrics["rec_n_valid"])
            self._record_arrays(
                np.asarray(metrics["rec_states"])[:nv],
                np.asarray(metrics["rec_counts"])[:nv],
            )
        self.n_steps += 1
        dt_step = time.time() - t0
        self.run_time += dt_step
        out = {
            "e_loc": float(metrics["e_loc"]),
            "e_loc_var": float(metrics["e_loc_var"]),
            "n_unique": n_unq,
            "n_samples": self.n_samples,
            "time": dt_step,
        }
        self.log["E_LOC"].append((self.n_steps, out["e_loc"]))
        self.log["E_LOC_VAR"].append((self.n_steps, out["e_loc_var"]))
        self.log["N_UNIQUE_SAMP"].append((self.n_steps, out["n_unique"]))
        self.log["TIME"].append((self.n_steps, self.run_time))
        return out

    def _current_lr(self) -> float:
        if not self.tc.use_lr_schedule:
            return self.tc.lr
        half = max(self.tc.n_train // 2, 1)
        return self.tc.lr if self.n_steps < half else self.tc.lr_final

    def step(self) -> dict:
        if (self._sharded_step is not None
                or self._sharded_sr_step is not None
                or self._sharded_kfac_step is not None):
            return self._step_sharded()
        if not (self.tc.use_sr or self.tc.use_kfac):
            return self._step_fused()
        t0 = time.time()
        batch = self.get_samples()
        self._record_samples(batch)
        if self.tc.use_sr:
            from naqs_tpu.sr import sr_update

            self.params, metrics = sr_update(
                self.cfg, self.params, self.dt, batch,
                jnp.float64(self._current_lr()),
                jnp.float64(self.tc.sr_damping),
                cg_iters=self.tc.sr_cg_iters,
                reweight_by_psi=self.tc.reweight_by_psi,
                kl_clip=(None if self.tc.sr_kl_clip is None
                         else jnp.float64(self.tc.sr_kl_clip)),
                fisher_mix=self.tc.sr_fisher_mix,
                table=self._table, fwd_chunk=self.tc.eloc_fwd_chunk,
            )
        elif self.tc.use_kfac:
            from naqs_tpu.kfac import kfac_init, kfac_update

            if self.kfac_state is None:
                self.kfac_state = kfac_init(self.params)
            self.params, self.kfac_state, metrics = kfac_update(
                self.cfg, self.params, self.kfac_state, self.dt, batch,
                jnp.float32(self._current_lr()),
                jnp.float32(self.tc.kfac_damping),
                jnp.float32(self.tc.kfac_decay),
                jnp.float32(self.tc.kfac_kl_clip),
            )
        else:
            self.params, self.opt_state, metrics = vmc_update(
                self.cfg,
                self.optimizer,
                self.params,
                self.opt_state,
                self.dt,
                batch,
                self.tc.reweight_by_psi,
                table=self._table, fwd_chunk=self.tc.eloc_fwd_chunk,
            )
        self.n_steps += 1
        dt_step = time.time() - t0
        self.run_time += dt_step
        # one device->host round-trip for all per-step scalars
        e_loc, e_var, n_unq = jax.device_get(
            (metrics["e_loc"], metrics["e_loc_var"], batch.n_unique)
        )
        out = {
            "e_loc": float(e_loc),
            "e_loc_var": float(e_var),
            "n_unique": int(n_unq),
            "n_samples": self.n_samples,
            "time": dt_step,
        }
        self.log["E_LOC"].append((self.n_steps, out["e_loc"]))
        self.log["E_LOC_VAR"].append((self.n_steps, out["e_loc_var"]))
        self.log["N_UNIQUE_SAMP"].append((self.n_steps, out["n_unique"]))
        self.log["TIME"].append((self.n_steps, self.run_time))
        return out

    def run(self, n_epochs: int, output_freq: int = 25, log_exact_energy: bool = False,
            save_freq: Optional[int] = None, callback=None):
        for i in range(n_epochs):
            out = self.step()
            if (self.n_steps % output_freq == 0) or self.n_steps == 1:
                if log_exact_energy:
                    e = float(
                        exact_energy(self.cfg, self.params, self.dt_h,
                                     jnp.asarray(self.hilbert.basis))
                    )
                    self.log["E"].append((self.n_steps, e))
                    out["e_exact"] = e
                recent = [v for _, v in self.log["E_LOC"][-output_freq:]]
                e_part = (f"E={out['e_exact']:.6f}, " if "e_exact" in out
                          else "")
                print(
                    f"step {self.n_steps}: <E_loc>={np.mean(recent):.6f} "
                    f"+/- {np.std(recent):.6f}, var={out['e_loc_var']:.6f}, "
                    f"unq={out['n_unique']}, n_samp={out['n_samples']:.2e}, "
                    f"{e_part}t={out['time']*1000:.0f}ms",
                    flush=True,
                )
            if save_freq and self.save_loc and self.n_steps % save_freq == 0:
                self.save()
            if callback is not None:
                callback(self, out)
        return self

    def get_density_samples(self, max_retries: int = 12) -> SampleBatch:
        """Deterministic support enumeration with an adaptive threshold:
        all states with probability mass >= d_p, d_p scaled x/÷10 to keep the
        support inside the unique-sample window (the DensitySamplingOptimizer
        controller, reference energy.py:1058-1205)."""
        for _ in range(max_retries):
            batch = sample_density(
                self.cfg, self.params, jnp.float64(self.d_p), self.capacity
            )
            overflow = bool(batch.overflow)
            n_unq = int(batch.n_unique)
            if overflow or n_unq > self.tc.n_unq_samples_max:
                self.d_p = min(self.d_p * 10.0, 0.5)
                continue
            if n_unq < self.tc.n_unq_samples_min and self.d_p > 1e-16:
                self.d_p = self.d_p / 10.0
                continue
            return batch
        raise RuntimeError(
            f"density threshold controller did not converge (d_p={self.d_p})"
        )

    def run_density(self, n_epochs: int, output_freq: int = 25,
                    d_p: Optional[float] = None):
        """Train on the deterministically-enumerated high-mass support
        (reference DensitySamplingOptimizer.run, energy.py:1058-1205), with
        |psi|^2 weights over the captured support."""
        if d_p is not None:
            self.d_p = float(d_p)
        for i in range(n_epochs):
            t0 = time.time()
            batch = self.get_density_samples()
            self._record_samples(batch)
            self.params, self.opt_state, metrics = vmc_update(
                self.cfg, self.optimizer, self.params, self.opt_state,
                self.dt, batch, reweight_by_psi=True,
                table=self._table, fwd_chunk=self.tc.eloc_fwd_chunk,
            )
            self.n_steps += 1
            self.run_time += time.time() - t0
            e = float(metrics["e_loc"])
            self.log["E_LOC"].append((self.n_steps, e))
            self.log["E_LOC_VAR"].append((self.n_steps, float(metrics["e_loc_var"])))
            self.log["N_UNIQUE_SAMP"].append((self.n_steps, int(batch.n_unique)))
            self.log["TIME"].append((self.n_steps, self.run_time))
            if (self.n_steps % output_freq == 0) or self.n_steps == 1:
                print(f"step {self.n_steps}: <E>={e:.6f} "
                      f"var={float(metrics['e_loc_var']):.6f} "
                      f"unq={int(batch.n_unique)} d_p={self.d_p:.2e}",
                      flush=True)
        return self

    def run_exact(self, n_epochs: int, output_freq: int = 25,
                  batch_size: Optional[int] = None,
                  save_freq: Optional[int] = None):
        """Train with exact |psi|^2 weights over the entire restricted basis
        (reference ExactSamplingOptimizer, energy.py:540-729). With
        `batch_size`, each step uses a random minibatch of basis states
        (the reference's DataLoader mode, energy.py:686)."""
        basis_np = self.hilbert.basis
        rng = np.random.default_rng(self.tc.seed + 1)

        def make_batch(states):
            states = np.sort(states)
            return SampleBatch(
                states=jnp.asarray(states),
                counts=jnp.ones((len(states),), jnp.float64),
                n_unique=jnp.int32(len(states)),
                overflow=jnp.array(False),
            )

        full_batch = None
        if not batch_size or batch_size >= len(basis_np):
            full_batch = make_batch(basis_np)

        if full_batch is not None:
            # fast path: the batch is the same every step, so scan FLUSH
            # steps per dispatch and read back one fixed-shape metrics
            # buffer (see vmc_update_scan). Flush boundaries respect
            # save_freq/output_freq via the n_live mask.
            # Flush length is SIZE-CAPPED: a 25-step scan over Li2O's
            # 644,365-state basis reproducibly crashes the axon TPU worker
            # (kernel fault; 4 steps run fine, scratch/probe_li2o_update.py
            # bisect), while H2O's 149,661 x 25 program is stable. Cap the
            # program at ~3e6 state-steps per dispatch.
            flush = max(1, min(25, int(3_000_000 // max(len(basis_np), 1))))
            # Adaptive crash fallback: the ~3e6 cap is an empirical bisect,
            # not a root cause. Each flush dispatch is guarded by an
            # in-flight sentinel file; a run that died mid-flush (axon
            # worker fault or tunnel stall) resumes with a halved scan
            # window for this save_loc, so an unexpected shape that still
            # crashes converges to per-step dispatch instead of crash-looping.
            sentinel = None
            if self.save_loc:
                os.makedirs(self.save_loc, exist_ok=True)
                sentinel = os.path.join(self.save_loc, "flush_inflight.json")
                if os.path.exists(sentinel):
                    try:
                        with open(sentinel) as f:
                            prev = int(json.load(f).get("flush", flush))
                    except Exception:
                        prev = flush
                    flush = max(1, min(flush, prev // 2))
                    print(f"run_exact: previous run died mid-flush "
                          f"(window {prev}); resuming with window {flush}",
                          flush=True)
            done = 0
            while done < n_epochs:
                k = min(flush, n_epochs - done)
                t0 = time.time()
                if sentinel:
                    with open(sentinel, "w") as f:
                        json.dump({"flush": flush, "step": self.n_steps}, f)
                self.params, self.opt_state, ms = vmc_update_scan(
                    self.cfg, self.optimizer, self.params, self.opt_state,
                    self.dt, full_batch, jnp.int32(k), length=flush,
                )
                ms = np.asarray(ms)  # ONE host readback per flush
                if sentinel:
                    os.remove(sentinel)
                wall = (time.time() - t0) / k
                nu = int(full_batch.n_unique)
                for i in range(k):
                    self.n_steps += 1
                    self.run_time += wall
                    e, v = float(ms[i, 0]), float(ms[i, 1])
                    self.log["E_LOC"].append((self.n_steps, e))
                    self.log["E_LOC_VAR"].append((self.n_steps, v))
                    self.log["N_UNIQUE_SAMP"].append((self.n_steps, nu))
                    self.log["TIME"].append((self.n_steps, self.run_time))
                    if (self.n_steps % output_freq == 0) or self.n_steps == 1:
                        print(f"step {self.n_steps}: <E>={e:.6f} "
                              f"var={v:.6f}", flush=True)
                done += k
                if save_freq and (self.n_steps % save_freq) < k:
                    self.save()
            return self

        for i in range(n_epochs):
            t0 = time.time()
            sel = rng.choice(len(basis_np), size=batch_size, replace=False)
            batch = make_batch(basis_np[sel])
            self.params, self.opt_state, metrics = vmc_update(
                self.cfg, self.optimizer, self.params, self.opt_state,
                self.dt, batch, reweight_by_psi=True,
                table=self._table, fwd_chunk=self.tc.eloc_fwd_chunk,
            )
            self.n_steps += 1
            self.run_time += time.time() - t0
            e = float(metrics["e_loc"])
            self.log["E_LOC"].append((self.n_steps, e))
            self.log["E_LOC_VAR"].append((self.n_steps, float(metrics["e_loc_var"])))
            self.log["N_UNIQUE_SAMP"].append((self.n_steps, int(batch.n_unique)))
            self.log["TIME"].append((self.n_steps, self.run_time))
            if (self.n_steps % output_freq == 0) or self.n_steps == 1:
                print(f"step {self.n_steps}: <E>={e:.6f} "
                      f"var={float(metrics['e_loc_var']):.6f}", flush=True)
            if save_freq and self.n_steps % save_freq == 0:
                self.save()
        return self

    # -- warm starts
    def pre_flatten(self, n_epochs: int, lr: float = 1e-3, batch_size: int = 2**17):
        basis = self.hilbert.basis
        target = float(math.log(1.0 / math.sqrt(len(basis))))
        opt = optax.adam(lr)
        opt_state = opt.init(self.params)
        step = make_pre_flatten_step(self.cfg, opt)
        n = len(basis)
        bs = min(batch_size, n)
        n_batches = -(-n // bs)
        pad = n_batches * bs - n
        basis_p = np.concatenate([basis, basis[:pad]]) if pad else basis
        tgt = jnp.full((bs,), target, dtype=jnp.float32)
        rng = np.random.default_rng(self.tc.seed)
        report = max(1, n_epochs // 10)
        for ep in range(n_epochs):
            perm = rng.permutation(len(basis_p))
            for b in range(n_batches):
                sl = jnp.asarray(basis_p[perm[b * bs:(b + 1) * bs]])
                self.params, opt_state, loss = step(self.params, opt_state, sl, tgt)
            if (ep + 1) % report == 0 or ep + 1 == n_epochs:
                print(f"pre_flatten: epoch {ep + 1}/{n_epochs}, "
                      f"loss={float(loss):.6f}", flush=True)
        return self

    def pre_train_targets(self, states: np.ndarray, target_psi: np.ndarray,
                          n_epochs: int, lr: float = 5e-3,
                          mag_floor: float = 1e-8, loss: str = "mse"):
        """Supervised warm start towards given complex amplitudes on given
        states (generalizes the reference's pre_train target_amps path,
        energy.py:799-828).

        `loss` selects the fit objective:
          - "mse": fits log|psi| by unweighted MSE and the sign/phase by a
            cosine loss (the original protocol). Democratic over states: a
            149k-state fit spends most of its gradient on tail entries,
            which measurably HURTS an already-good full-mask model (round-3
            finding: post-fit exact energy fell -76.114 -> -75.96 on
            H2O 6-31G CISDTQ while the fit loss decreased).
          - "wmse": the same per-state losses weighted by |target|^2 (mixed
            with 5% uniform so tail states stay constrained) — the weighted
            mean is removed under the same weights, so the common log-amp
            offset stays free.
          - "overlap": maximizes log-fidelity
            log(|<t|psi>|^2 / <psi_S|psi_S>) over the fitted set S — the
            quantity VMC actually needs from a warm start, invariant to
            normalization, and automatically amplitude-weighted. For a
            full-basis eigenvector target this is exact log-infidelity.

        `mag_floor` (mse path) clamps |target|/max(|target|) from below. It
        must stay moderate: fitting log-amp targets of log(1e-30) = -69 for
        numerically zero eigenvector entries collapses the sampled
        distribution onto a near-delta (observed on stretched N2:
        n_unique -> 1, zero gradient, then NaN weights), because the
        conditional renormalization concentrates all removed mass on the
        dominant state."""
        states = np.asarray(states, dtype=np.uint64)
        order = np.argsort(states)
        states = states[order]
        t = np.asarray(target_psi)[order]
        mag = np.abs(t)
        mag = np.maximum(mag / max(mag.max(), 1e-300), mag_floor)
        la_t = jnp.asarray(np.log(mag), dtype=jnp.float32)
        ph_t = jnp.asarray(np.angle(t), dtype=jnp.float32)
        w_t = np.abs(t) ** 2
        w_t = w_t / max(w_t.sum(), 1e-300)
        w_t = jnp.asarray(0.95 * w_t + 0.05 / len(t), dtype=jnp.float32)
        s_dev = jnp.asarray(states)
        opt = optax.adam(lr)
        opt_state = opt.init(self.params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                la, ph = log_psi(self.cfg, p, s_dev)
                if loss == "overlap":
                    # log <psi_S|psi_S> - log |<t|psi>|^2, computed stably
                    # in log space (la is arbitrarily normalized)
                    m = jax.lax.stop_gradient(jnp.max(la))
                    r = jnp.exp(la - m)
                    norm = jnp.log(jnp.sum(r * r))
                    dph = ph - ph_t
                    ov_re = jnp.sum(jnp.exp(la_t) * r * jnp.cos(dph))
                    ov_im = jnp.sum(jnp.exp(la_t) * r * jnp.sin(dph))
                    ov = jnp.log(ov_re**2 + ov_im**2 + 1e-300)
                    return norm - ov
                if loss == "wmse":
                    d = la - la_t
                    d = d - jnp.sum(w_t * d)
                    return (jnp.sum(w_t * d * d)
                            + jnp.sum(w_t * (1.0 - jnp.cos(ph - ph_t))))
                # "mse": match log-amplitudes up to a common constant
                d = la - la_t
                loss_amp = jnp.mean((d - jnp.mean(d)) ** 2)
                loss_ph = jnp.mean(1.0 - jnp.cos(ph - ph_t))
                return loss_amp + loss_ph

            loss_v, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss_v

        # progress prints double as watchdog keep-alives: a 1500-epoch fit
        # over a 1e5-state target set is ~10 min of otherwise-silent device
        # work, longer than the fleet's stall window
        report = max(1, n_epochs // 15)
        for ep in range(n_epochs):
            self.params, opt_state, loss = step(self.params, opt_state)
            if (ep + 1) % report == 0 or ep + 1 == n_epochs:
                print(f"pre_train_targets: epoch {ep + 1}/{n_epochs}, "
                      f"loss={float(loss):.6f}", flush=True)
        return float(loss)

    def warm_start_from_solve_h(self, n_epochs: int = 500, n_samps: Optional[float] = None,
                                k_max: int = 10000, lr: float = 2e-3,
                                select_min: float = 1e-4,
                                states: Optional[np.ndarray] = None,
                                target_s2: Optional[float] = None,
                                loss: str = "mse"):
        """Escape optimization traps by re-targeting the model at the ground
        state of H restricted to the currently-sampled subspace: sample ->
        diagonalize (host, native C++ assembly) -> supervised pre-train to
        the eigenvector. Tractable where exact diagonalization is not
        (k_max states), and uses only quantities the framework already has.

        Only eigenvector entries with |v| > select_min * max|v| are fitted:
        numerically-zero entries carry no signal about the target state, and
        dragging their log-amplitudes to the clamp floor concentrates the
        sampled distribution onto a near-delta from which count-weighted
        VMC cannot recover (zero variance => zero gradient; round-2 NaN
        failure on N2 at r >= 1.8).
        """
        from scipy.sparse.linalg import eigsh

        explicit_states = states is not None
        if states is not None:
            # explicit subspace (e.g. the full basis in exact-sampling
            # mode, where no sampled counter exists)
            states = np.sort(np.asarray(states, dtype=np.uint64))
        elif self.sampled_counter:
            keys = np.fromiter(self.sampled_counter.keys(), dtype=np.uint64,
                               count=len(self.sampled_counter))
            vals = np.fromiter(self.sampled_counter.values(), dtype=np.float64,
                               count=len(self.sampled_counter))
            if len(keys) > k_max:
                top = np.argpartition(vals, -k_max)[-k_max:]
                keys = keys[top]
            states = np.sort(keys)
        else:
            self.key, k = jax.random.split(self.key)
            batch = sample(
                self.cfg, self.params, k,
                jnp.float64(n_samps or self.n_samples), self.capacity,
            )
            nu = int(batch.n_unique)
            states = np.asarray(batch.states)[:nu]
            counts = np.asarray(batch.counts)[:nu]
            if nu > k_max:
                top = np.argsort(counts)[-k_max:]
                states = np.sort(states[top])
        cache = None
        if explicit_states and len(states) > 50_000:
            # big explicit-subspace eigensolves are deterministic in
            # (terms, states) and can take ~25 min on host (Li2O CISDTQ:
            # assemble 533 s + eigsh 1059 s) — cache to disk so resumed /
            # chained runs skip them
            import hashlib

            # hash EVERY term array assemble_sparse_hamiltonian_np consumes:
            # two Hamiltonians differing only in parity masks / group maps /
            # diagonal terms must not collide (advisor finding, round 4)
            h = hashlib.sha1(states.tobytes())
            for arr in (self.terms.coeff, self.terms.xy_unique,
                        self.terms.yz_unique, self.terms.gxy, self.terms.gyz,
                        self.terms.diag_yz, self.terms.diag_coeff):
                h.update(np.ascontiguousarray(arr).tobytes())
            h.update(np.float64(target_s2 if target_s2 is not None else -1))
            cache = os.path.join("data", "ws_cache", h.hexdigest()[:16] + ".npz")
        if cache and os.path.exists(cache):
            z = np.load(cache)
            e0, vec = float(z["e0"]), z["vec"]
            print(f"solve_h warm start: loaded cached eigenvector "
                  f"({len(states)} states, E0={e0:.6f}) from {cache}",
                  flush=True)
        else:
            with _heartbeat(f"solve_h warm start: assembling/diagonalizing "
                            f"{len(states)} states"):
                H = assemble_sparse_hamiltonian_np(self.terms, states)
                e0, vec = self._lowest_state(H, states, target_s2)
            if cache:
                os.makedirs(os.path.dirname(cache), exist_ok=True)
                np.savez(cache, e0=e0, vec=vec)
        if loss in ("overlap", "wmse"):
            # these losses MUST see the full state set: the norm term
            # (overlap) / the weighted residual (wmse) only counts fitted
            # states, so pruning numerically-zero eigenvector entries lets
            # the model park arbitrary mass on them unpenalized (measured on
            # LiH: restricted log-fidelity -0.018 while the true energy sat
            # 400 mHa high). Near-zero targets contribute nothing to <t|psi>
            # but their norm contribution penalizes exactly that leak. The
            # mse mag_floor delta-collapse hazard does not apply: overlap has
            # no per-state log target, and wmse weight-suppresses the tail.
            keep = np.ones(len(vec), bool)
        else:
            keep = np.abs(vec) > select_min * np.abs(vec).max()
            if keep.sum() < 2:  # degenerate fit target: fall back to all
                keep = np.ones(len(vec), bool)
        self.pre_train_targets(states[keep], vec[keep].astype(np.complex128),
                               n_epochs, lr=lr, loss=loss)
        if explicit_states:
            # only explicit-subspace (full-basis) solves are reusable as
            # the final "VMC+FCI": a counter-subspace E0 is tied to the
            # moment's sampled support and must not survive a mode change
            self.ws_result = (float(e0), len(states))
        return float(e0), len(states)

    def _lowest_state(self, H, states, target_s2):
        """(e0, eigenvector) of sparse H, optionally spin-selected."""
        from scipy.sparse.linalg import eigsh

        if target_s2 is not None and H.shape[0] >= 3:
            # spin-resolved selection: the JW particle sector is an S_z
            # sector, and for stretched geometries non-target-spin states
            # can lie below the target-spin ground state (utils/spin.py)
            from naqs_tpu.utils.spin import lowest_eig_with_spin

            e0, vec, s2_list, idx = lowest_eig_with_spin(
                H, states, self.hilbert.n_qubits, target_s2=target_s2)
            if idx is None:
                print(f"solve_h: no eigenstate with <S^2>~{target_s2} in "
                      f"lowest {len(s2_list)} (s2={np.round(s2_list, 2)}); "
                      "using ground state", flush=True)
            elif idx > 0:
                print(f"solve_h: spin-selected eigenstate #{idx} "
                      f"(s2={np.round(s2_list, 2)})", flush=True)
        elif H.shape[0] < 3:
            w, v = np.linalg.eigh(H.toarray())
            vec = v[:, 0]
            e0 = w[0]
        else:
            w, v = eigsh(H, k=1, which="SA")
            vec, e0 = v[:, 0], w[0]
        return e0, vec

    def pre_train_hf(self, n_epochs: int, lr: float = 5e-3):
        """BCE pre-training towards the Hartree-Fock state (pre_train with
        default target; energy.py:799-801)."""
        opt = optax.adam(lr)
        opt_state = opt.init(self.params)
        step = make_pre_train_step(self.cfg, opt)
        states = jnp.asarray(np.array([self.hilbert.hf_state()], dtype=np.uint64))
        target = jnp.ones((1,), dtype=jnp.float32)
        for _ in range(n_epochs):
            self.params, opt_state, loss = step(self.params, opt_state, states, target)
        return self

    # -- evaluation
    def exact_energy(self) -> float:
        # dt_h: always the physical H, even when training on a penalized
        # operator (dt = H + lam * S^2)
        return float(
            exact_energy(self.cfg, self.params, self.dt_h, jnp.asarray(self.hilbert.basis))
        )

    def solve_h(self, n_samps: Optional[float] = None, k_max: int = 10000,
                use_counter: bool = True, target_s2: Optional[float] = None,
                states: Optional[np.ndarray] = None):
        """Diagonalize H restricted to the top-k_max MOST-SAMPLED states over
        the whole training history ("VMC+FCI", energy.py:762-786; the
        reference accumulates every sampled index in a Counter,
        energy.py:137,300). Falls back to one fresh sample when no history
        exists (e.g. before training). An explicit `states` array overrides
        both (exact-sampling mode passes the full training basis — the
        counter is never fed there). Returns (energy, n_unique_used)."""
        from scipy.sparse.linalg import eigsh

        if states is not None:
            states = np.sort(np.asarray(states, dtype=np.uint64))
            nu = len(states)
        elif use_counter and self.sampled_counter:
            keys = np.fromiter(self.sampled_counter.keys(), dtype=np.uint64,
                               count=len(self.sampled_counter))
            vals = np.fromiter(self.sampled_counter.values(), dtype=np.float64,
                               count=len(self.sampled_counter))
            if len(keys) > k_max:
                top = np.argpartition(vals, -k_max)[-k_max:]
                keys = keys[top]
            states = np.sort(keys)
            nu = len(states)  # the actually-diagonalized subspace size
        else:
            self.key, k = jax.random.split(self.key)
            batch = sample(
                self.cfg, self.params, k,
                jnp.float64(n_samps or self.n_samples), self.capacity,
            )
            nu = int(batch.n_unique)
            states = np.asarray(batch.states[:nu])
            counts = np.asarray(batch.counts[:nu])
            if nu > k_max:
                top = np.argsort(counts)[-k_max:]
                states = np.sort(states[top])
            nu = len(states)
        with _heartbeat(f"solve_h: assembling/diagonalizing {nu} states"):
            H = assemble_sparse_hamiltonian_np(self.terms, states)
            if H.shape[0] < 3:
                w = np.linalg.eigvalsh(H.toarray())
                return float(w[0]), nu
            if target_s2 is not None:
                from naqs_tpu.utils.spin import lowest_eig_with_spin

                e0, _vec, _s2, _idx = lowest_eig_with_spin(
                    H, states, self.hilbert.n_qubits, target_s2=target_s2)
                return float(e0), nu
            w = eigsh(H, k=1, which="SA")[0]
        return float(w[0]), nu

    def save_log(self, fname: str = "log"):
        """Persist metrics as JSONL + pandas pickle (reference energy.py:511)."""
        from naqs_tpu.utils.profiling import save_log as _save_log

        assert self.save_loc, "save_loc not set"
        os.makedirs(self.save_loc, exist_ok=True)
        return _save_log(self.log, os.path.join(self.save_loc, fname))

    # -- checkpointing
    # counter entries persisted per checkpoint; matches the largest
    # -solve_h_kmax in production use (Li2O's top-200k CI), so the
    # truncation is loss-free for every configured solve
    COUNTER_SAVE_MAX = 200_000

    def save(self, fname: str = "checkpoint"):
        from flax import serialization

        assert self.save_loc, "save_loc not set"
        os.makedirs(self.save_loc, exist_ok=True)
        path = os.path.join(self.save_loc, f"{fname}.msgpack")
        blob = serialization.to_bytes(
            {"params": self.params, "opt_state": self.opt_state}
        )
        with open(path, "wb") as f:
            f.write(blob)
        if self.kfac_state is not None:
            with open(os.path.join(self.save_loc, f"{fname}_kfac.msgpack"),
                      "wb") as f:
                f.write(serialization.to_bytes(self.kfac_state))
        # the sampled-state history counter feeding solve_h (the reference
        # checkpoints its Counter too, energy.py:409-487) — without it a
        # resumed run's "VMC+FCI" subspace sees only post-resume history
        if self.sampled_counter:
            keys = np.fromiter(self.sampled_counter.keys(), dtype=np.uint64,
                               count=len(self.sampled_counter))
            vals = np.fromiter(self.sampled_counter.values(), dtype=np.float64,
                               count=len(self.sampled_counter))
            if len(keys) > self.COUNTER_SAVE_MAX:
                top = np.argpartition(vals, -self.COUNTER_SAVE_MAX)[
                    -self.COUNTER_SAVE_MAX:]
                keys, vals = keys[top], vals[top]
            np.savez_compressed(
                os.path.join(self.save_loc, f"{fname}_counter.npz"),
                states=keys, counts=vals,
            )
        # metric history as compact compressed arrays, NOT inline JSON: a
        # 4k-step log was ~400 KB of re-committed text per checkpoint sync
        # (advisor finding, round 3); resumes need it to keep trailing-mean
        # summaries correct across restarts. Written BEFORE the json: the
        # json is the checkpoint's commit record, so a crash between the two
        # leaves an old json + new npz (a dangling future log the old resume
        # ignores past its n_steps) rather than a new json silently paired
        # with a STALE log (advisor finding, round 4).
        log_arrays = {}
        for k, v in self.log.items():
            a = np.asarray(v, dtype=np.float64).reshape(-1, 2)
            log_arrays[f"{k}__steps"] = a[:, 0]
            log_arrays[f"{k}__vals"] = a[:, 1]
        np.savez_compressed(
            os.path.join(self.save_loc, f"{fname}_log.npz"), **log_arrays)
        meta = {
            "n_steps": self.n_steps,
            "run_time": self.run_time,
            "n_samples": self.n_samples,
            "d_p": self.d_p,
            "ws_result": self.ws_result,
            "prng_key": np.asarray(jax.random.key_data(self.key)).tolist(),
        }
        with open(os.path.join(self.save_loc, f"{fname}.json"), "w") as f:
            json.dump(meta, f)
        return path

    def load(self, fname: str = "checkpoint", params_only: bool = False):
        """Restore a checkpoint. ``params_only=True`` restores just the
        model (warm starts across training configs): the optimizer-state
        pytree is structure-matched to THIS trainer's optax chain, so a
        checkpoint written under a different chain (e.g. lr-schedule vs
        constant-lr runs differ by a ScaleByScheduleState) cannot be
        deserialized into it — and a warm start should begin with fresh
        optimizer moments anyway."""
        from flax import serialization

        path = os.path.join(self.save_loc, f"{fname}.msgpack")
        with open(path, "rb") as f:
            blob = f.read()
        if params_only:
            # the blob's opt_state subtree may not match self.opt_state's
            # structure; deserialize params against a params-only target
            # (flax from_bytes tolerates extra top-level dict keys in the
            # TARGET only, so deserialize the full dict leniently by
            # matching params alone)
            state_dict = serialization.msgpack_restore(blob)
            self.params = serialization.from_state_dict(
                self.params, state_dict["params"], name="params"
            )
            self.opt_state = self.optimizer.init(self.params)
            return self
        restored = serialization.from_bytes(
            {"params": self.params, "opt_state": self.opt_state}, blob
        )
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        kfac_path = os.path.join(self.save_loc, f"{fname}_kfac.msgpack")
        if os.path.exists(kfac_path):
            from naqs_tpu.kfac import kfac_init

            with open(kfac_path, "rb") as f:
                self.kfac_state = serialization.from_bytes(
                    kfac_init(self.params), f.read()
                )
        counter_path = os.path.join(self.save_loc, f"{fname}_counter.npz")
        if os.path.exists(counter_path):
            with np.load(counter_path) as z:
                self.sampled_counter = dict(
                    zip(z["states"].tolist(), z["counts"].tolist())
                )
        meta_path = os.path.join(self.save_loc, f"{fname}.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            self.n_steps = meta["n_steps"]
            self.run_time = meta["run_time"]
            self.n_samples = meta["n_samples"]
            self.d_p = meta.get("d_p", self.d_p)
            ws = meta.get("ws_result")
            self.ws_result = tuple(ws) if ws else None
            if "prng_key" in meta:
                # resume the sample stream where the interrupted run left it
                self.key = jax.random.wrap_key_data(
                    jnp.asarray(meta["prng_key"], dtype=jnp.uint32)
                )
            if "log" in meta:  # pre-round-4 checkpoints carried it inline
                self.log = {k: [tuple(x) for x in v]
                            for k, v in meta["log"].items()}
            else:
                log_path = os.path.join(self.save_loc, f"{fname}_log.npz")
                if os.path.exists(log_path):
                    with np.load(log_path) as z:
                        keys = {n.rsplit("__", 1)[0] for n in z.files}
                        # merge: channels absent from the npz keep their
                        # (empty) __init__ defaults. Steps are always
                        # integral — cast back to int so resumed entries
                        # match the ints freshly-appended ones use
                        # (advisor finding, round 4)
                        for k in keys:
                            self.log[k] = list(zip(
                                z[f"{k}__steps"].astype(np.int64).tolist(),
                                z[f"{k}__vals"].tolist()))
        return self


def save_psi(trainer: "VMCTrainer", fname: str, normalise: bool = True, max_states: int = 1_000_000):
    """Dump sorted wavefunction amplitudes/phases over the restricted basis
    (reference save_psi, wavefunction.py:264-286): writes <fname>.txt
    (amp, phase rows), <fname>_basis.txt (bitstrings), <fname>_basis_idxs.txt."""
    import jax.numpy as jnp

    basis = trainer.hilbert.basis
    if len(basis) > max_states:
        raise ValueError(f"basis too large to dump ({len(basis)} > {max_states})")
    la, ph = log_psi(trainer.cfg, trainer.params, jnp.asarray(basis))
    la = np.asarray(la, dtype=np.float64)
    ph = np.asarray(ph, dtype=np.float64)
    amps = np.exp(la - la.max())
    if normalise:
        amps = amps / np.sqrt(np.sum(amps**2))
    order = np.argsort(amps)[::-1]
    from naqs_tpu.utils.bits import np_unpack_bits

    np.savetxt(f"{fname}.txt", np.stack([amps[order], ph[order]], 1), fmt="%.6e")
    np.savetxt(f"{fname}_basis.txt", np_unpack_bits(basis[order], trainer.cfg.n_qubits), fmt="%i")
    np.savetxt(f"{fname}_basis_idxs.txt", order, fmt="%i")
    return fname
