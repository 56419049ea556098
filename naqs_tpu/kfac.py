"""K-FAC natural-gradient VMC updates (Kronecker-factored Fisher).

Port of the reference's KFACOptimizer (reference src/optimizer/utils.py:19-268,
duplicated at src/utils/optim.py:7-256): per dense layer, the Fisher block is
approximated as A (x) G with A = E[a a^T] the input second moment and
G = E[g g^T] the pre-activation-gradient second moment, both tracked as
exponential running averages; the preconditioned update is
(A + damping*I)^-1 grad_W (G + damping*I)^-1, globally rescaled by the
KL-clip factor nu = min(1, sqrt(kl_clip / sum <grad, lr^2 * precond>)).

TPU-native re-design: instead of module forward/backward hooks, per-example
pre-activation gradients come from differentiating w.r.t. zero perturbations
added to every pre-activation (models/nade.py: log_psi_taps / make_zero_eps),
and all factor algebra is batched over (layer-stack, shell) dims as stacked
small matrix solves — one jitted update, no Python-per-layer work on device.

The reference wires KFAC into reset_optimizer (energy.py:158-164) but ships
Adam for production; here KFAC is a first-class TrainConfig option
(use_kfac) alongside Adam and SR.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from naqs_tpu.models.nade import (
    NAQSConfig, log_psi, log_psi_taps, make_zero_eps)
from naqs_tpu.ops.local_energy import DeviceTerms, local_energy


def kfac_init(params) -> dict:
    """Running-average Kronecker factors for every dense stack."""
    state = {"step": jnp.zeros((), jnp.int32)}
    for name in ("amp", "phase"):
        if name not in params:
            continue
        facs = []
        for lyr in params[name]:
            n_stack, d_in, d_out = lyr["w"].shape
            facs.append({
                "A": jnp.zeros((n_stack, d_in, d_in), jnp.float32),
                "G": jnp.zeros((n_stack, d_out, d_out), jnp.float32),
            })
        state[name] = facs
    return state


def _factor_stats(a, g, w):
    """Weighted second moments over the batch.

    a: (B, S, i) or (B, i) layer inputs; g: matching pre-activation grads of
    the TOTAL loss (weights folded in by autodiff); w: (B,) sample weights.
    Returns (A, G): (S, i, i), (S, o, o) with S=1 for unstacked layers.
    """
    if a.ndim == 2:
        a = a[:, None, :]
        g = g[:, None, :]
    w32 = w.astype(jnp.float32)
    a = a.astype(jnp.float32)
    g = g.astype(jnp.float32)
    A = jnp.einsum("b,bsi,bsj->sij", w32, a, a)
    # g carries the per-example loss weight already (grad of the weighted
    # sum); divide it out once so G is an expectation like A:
    # G = sum_b w_b (g_b/w_b)(g_b/w_b)^T = sum_b g_b g_b^T / w_b.
    inv_w = jnp.where(w32 > 0, 1.0 / jnp.maximum(w32, 1e-30), 0.0)
    G = jnp.einsum("b,bsi,bsj->sij", inv_w, g, g)
    return A, G


def _precondition(fac, gw, gb, damping):
    """(A+dI)^-1 gw (G+dI)^-1 and (G+dI)^-1 gb, batched over the stack dim."""
    n_stack, d_in, _ = fac["A"].shape
    d_out = fac["G"].shape[-1]
    eye_i = jnp.eye(d_in, dtype=jnp.float32)
    eye_o = jnp.eye(d_out, dtype=jnp.float32)
    # pi-corrected Tikhonov split (standard KFAC damping heuristic)
    tr_a = jnp.trace(fac["A"], axis1=-2, axis2=-1) / d_in
    tr_g = jnp.trace(fac["G"], axis1=-2, axis2=-1) / d_out
    pi = jnp.sqrt(jnp.maximum(tr_a, 1e-12) / jnp.maximum(tr_g, 1e-12))
    lam = jnp.sqrt(damping).astype(jnp.float32)
    A_d = fac["A"] + (lam * pi)[:, None, None] * eye_i
    G_d = fac["G"] + (lam / pi)[:, None, None] * eye_o
    tmp = jnp.linalg.solve(A_d, gw.astype(jnp.float32))          # (S, i, o)
    vw = jnp.linalg.solve(G_d, tmp.swapaxes(-1, -2)).swapaxes(-1, -2)
    vb = jnp.linalg.solve(G_d, gb.astype(jnp.float32)[..., None])[..., 0]
    return vw, vb


def kfac_apply(
    cfg: NAQSConfig,
    params,
    kstate: dict,
    states,
    w,
    d_re,
    d_im,
    lr,
    damping,
    decay,
    kl_clip,
    psum=lambda x: x,
):
    """Shared KFAC math given centred local-energy deviations.

    `w` must be the GLOBALLY normalized sample weights (sum over all data-
    parallel shards == 1) and `psum` the cross-shard sum (identity on one
    device): factor moments, parameter gradients and the KL-clip inner
    product are `psum`-reduced so every shard applies the identical update.
    Returns (new_params, new_kstate, loss).
    """
    lr = jnp.float32(lr)
    cap = states.shape[0]
    eps0 = make_zero_eps(cfg, params, cap)
    d_re = jax.lax.stop_gradient(d_re).astype(jnp.float32)
    d_im = jax.lax.stop_gradient(d_im).astype(jnp.float32)
    wf = w.astype(jnp.float32)

    def loss_fn(p, eps):
        (la, ph), taps = log_psi_taps(cfg, p, states, eps)
        loss = 2.0 * jnp.sum(wf * (la * d_re + ph * d_im))
        return loss, taps

    (loss, taps), (g_params, g_eps) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(params, eps0)
    loss = psum(loss)
    g_params = jax.tree_util.tree_map(psum, g_params)

    step = kstate["step"] + 1
    # bias-corrected EMA: effective average over min(step, 1/(1-decay)) steps
    corr = 1.0 - decay ** step.astype(jnp.float32)
    new_state = {"step": step}
    new_params = dict(params)
    vg_sum = jnp.zeros((), jnp.float32)
    updates = {}

    for name in ("amp", "phase"):
        if name not in params:
            continue
        facs, upds = [], []
        for li, lyr in enumerate(params[name]):
            a = taps[name][li]
            g = g_eps[name][li]
            A, G = _factor_stats(a, g, w)
            A, G = psum(A), psum(G)
            fac = kstate[name][li]
            A_ema = decay * fac["A"] + (1.0 - decay) * A
            G_ema = decay * fac["G"] + (1.0 - decay) * G
            facs.append({"A": A_ema, "G": G_ema})
            fac_hat = {"A": A_ema / corr, "G": G_ema / corr}
            gw = g_params[name][li]["w"]
            gb = g_params[name][li]["b"]
            vw, vb = _precondition(fac_hat, gw, gb, jnp.float32(damping))
            vg_sum = vg_sum + (lr ** 2) * (
                jnp.sum(vw * gw.astype(jnp.float32))
                + jnp.sum(vb * gb.astype(jnp.float32))
            )
            upds.append({"w": vw, "b": vb})
        new_state[name] = facs
        updates[name] = upds

    nu = jnp.minimum(1.0, jnp.sqrt(kl_clip / jnp.maximum(vg_sum, 1e-12)))
    scale = (lr * nu).astype(jnp.float32)
    for name in updates:
        new_params[name] = [
            {"w": lyr["w"] - scale * upd["w"], "b": lyr["b"] - scale * upd["b"]}
            for lyr, upd in zip(params[name], updates[name])
        ]
    # non-dense params (LUT tables): plain SGD with the same clipped scale
    for name in params:
        if name in ("amp", "phase"):
            continue
        new_params[name] = jax.tree_util.tree_map(
            lambda p, g: p - scale * g, params[name], g_params[name]
        )

    return new_params, new_state, {"loss": loss, "nu": nu}


@partial(jax.jit, static_argnames=("cfg",))
def kfac_update(
    cfg: NAQSConfig,
    params,
    kstate: dict,
    dt: DeviceTerms,
    batch,
    lr,
    damping=1e-2,
    decay=0.95,
    kl_clip=1e-3,
):
    """One single-device KFAC VMC step. Returns (params, kstate, metrics)."""
    cap = batch.states.shape[0]
    live = jnp.arange(cap) < batch.n_unique
    la, ph = log_psi(cfg, params, batch.states)
    la, ph = jax.lax.stop_gradient((la, ph))
    w = jnp.where(live, batch.counts, 0.0)
    w = w / jnp.sum(w)
    e_re, e_im = local_energy(dt, batch.states, la, ph, batch.n_unique)
    e_re = jnp.where(live, e_re, 0.0)
    e_im = jnp.where(live, e_im, 0.0)
    e_mean = jnp.sum(w * e_re)
    e_var = jnp.sum(w * (e_re - e_mean) ** 2)
    new_params, new_state, m = kfac_apply(
        cfg, params, kstate, batch.states, w,
        e_re - e_mean, e_im - jnp.sum(w * e_im),
        lr, damping, decay, kl_clip,
    )
    metrics = {"e_loc": e_mean, "e_loc_var": e_var, **m}
    return new_params, new_state, metrics
