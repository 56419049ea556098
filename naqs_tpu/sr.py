"""Stochastic reconfiguration (natural-gradient) VMC updates, matrix-free.

The reference ships a Kronecker-factored second-order optimizer
(KFACOptimizer, src/optimizer/utils.py:19-268 — wired but unused by its
production scripts). For VMC the canonical second-order method is stochastic
reconfiguration: precondition the energy gradient with the quantum Fisher
matrix S = Re(<conj(O) O^T> - <conj(O)><O>^T), O_k = d log psi / d theta_k.

TPU-first: S is never materialized. S@v products are one jvp + one vjp over
the sampled batch; (S + damping I) x = grad is solved with conjugate
gradients. Cost per step ~ (2 * cg_iters + 2) model passes.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from naqs_tpu.models.nade import NAQSConfig, log_psi
from naqs_tpu.ops.local_energy import DeviceTerms, local_energy
from naqs_tpu.sampler import SampleBatch


@partial(jax.jit, static_argnames=("cfg", "cg_iters", "reweight_by_psi",
                                   "fisher_mix", "fwd_chunk"))
def sr_update(
    cfg: NAQSConfig,
    params,
    dt: DeviceTerms,
    batch: SampleBatch,
    lr: jnp.ndarray,
    damping: jnp.ndarray,
    cg_iters: int = 50,
    reweight_by_psi: bool = False,
    kl_clip: jnp.ndarray = None,
    fisher_mix: float = 0.0,
    table=None,
    fwd_chunk: int = 65536,
):
    """One SR step. Returns (new_params, metrics).

    reweight_by_psi: weight the unique support by |psi|^2 instead of
    empirical counts. Count weights make sampled SR collapse onto HF on
    tiny-support problems (once HF dominates the counts, the Fisher flow
    reinforces the concentration — RESULTS.md optimizer ablation), while
    |psi|^2-weighted exact-mode SR converges; this brings the sampled path
    the same weighting.

    kl_clip: trust-region cap on the quadratic step length dx^T S dx
    (the KFAC kl_clip, reference optimizer/utils.py KL clipping) — scales
    lr down whenever the natural step would move the distribution more
    than kl_clip nats.

    fisher_mix: support-regularized metric. As |psi|^2 concentrates, BOTH
    count and psi^2 weights degenerate and the Fisher matrix loses every
    direction that would move mass back onto the sampled-but-light states
    (the HF-collapse mechanism). Mixing eps of a uniform distribution over
    the live support into the FISHER weights only — the energy-gradient
    weights stay untouched, so stationary points are unchanged; only the
    preconditioning geometry is regularized (any PSD metric is a valid
    natural-gradient preconditioner)."""
    live = jnp.arange(batch.states.shape[0]) < batch.n_unique
    flat0, unravel = ravel_pytree(params)

    def f(flat):
        la, ph = log_psi(cfg, unravel(flat), batch.states)
        return la.astype(jnp.float64), ph.astype(jnp.float64)

    la, ph = f(flat0)
    if reweight_by_psi:
        w = jnp.where(live, jnp.exp(2.0 * la), 0.0)
    else:
        w = jnp.where(live, batch.counts, 0.0)
    w = w / jnp.sum(w)

    if table is not None:
        # exact local energies: resolve coupled states against a psi table
        # over the ENTIRE enumerated sector (same contract as vmc_update,
        # trainer.py:226-243); no gradient flows through E_loc
        from naqs_tpu.trainer import log_psi_table

        t_states, t_n = table
        t_vals = jax.lax.stop_gradient(
            log_psi_table(cfg, params, t_states, fwd_chunk))
        e_re, e_im = local_energy(
            dt, t_states, t_vals[0], t_vals[1], t_n,
            queries=(batch.states, la.astype(jnp.float32),
                     ph.astype(jnp.float32)),
        )
    else:
        e_re, e_im = local_energy(
            dt, batch.states, la.astype(jnp.float32), ph.astype(jnp.float32),
            batch.n_unique,
        )
    e_re = jnp.where(live, e_re, 0.0)
    e_im = jnp.where(live, e_im, 0.0)
    e_mean = jnp.sum(w * e_re)
    e_mean_im = jnp.sum(w * e_im)
    e_var = jnp.sum(w * (e_re - e_mean) ** 2)
    d_re = e_re - e_mean
    d_im = e_im - e_mean_im

    # energy gradient: 2 Re <conj(O) dE> = vjp with cotangents (w*dRe, w*dIm)
    _, vjp = jax.vjp(f, flat0)
    grad = (2.0 * vjp((w * d_re, w * d_im))[0]).astype(flat0.dtype)
    damping = damping.astype(flat0.dtype)

    if fisher_mix > 0.0:
        n_live = jnp.maximum(jnp.sum(live.astype(jnp.float64)), 1.0)
        w_f = (1.0 - fisher_mix) * w + fisher_mix * live / n_live
    else:
        w_f = w

    def s_matvec(v):
        # S v: jvp (O v, centered), then weighted vjp. Centering the jvp
        # output also kills the <O> outer-product term because the weighted
        # cotangents then sum to zero.
        u_la, u_ph = jax.jvp(f, (flat0,), (v,))[1]
        u_la = u_la - jnp.sum(w_f * u_la)
        u_ph = u_ph - jnp.sum(w_f * u_ph)
        sv = vjp((w_f * u_la, w_f * u_ph))[0].astype(flat0.dtype)
        return sv + damping * v

    x, _ = jax.scipy.sparse.linalg.cg(
        s_matvec, grad, x0=grad, maxiter=cg_iters, tol=1e-10
    )
    lr = lr.astype(flat0.dtype)
    if kl_clip is not None:
        # dx = lr * x moves the distribution ~ 0.5 dx^T S dx nats; cap it
        q = jnp.maximum(x @ s_matvec(x), 1e-300)
        lr = lr * jnp.minimum(
            1.0, jnp.sqrt(kl_clip.astype(flat0.dtype) / (lr * lr * q)))
    new_flat = flat0 - lr * x
    # withhold the update on overflow (truncated batch => biased) or any
    # non-finite (one NaN would poison params permanently — same guard as
    # the Adam path, trainer.py:265-276)
    bad = (batch.overflow
           | ~jnp.isfinite(e_mean)
           | ~jnp.isfinite(jnp.sum(new_flat)))
    new_flat = jnp.where(bad, flat0, new_flat)
    metrics = {
        "e_loc": e_mean,
        "e_loc_var": e_var,
        "sr_dx_norm": jnp.linalg.norm(x),
        "grad_norm": jnp.linalg.norm(grad),
    }
    return unravel(new_flat), metrics
