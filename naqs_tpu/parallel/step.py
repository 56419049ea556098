"""Multi-chip data parallelism over the unique-sample batch.

The reference is strictly single-process/single-GPU (SURVEY.md section 2.3);
this layer is new, designed TPU-first: a 1-D device mesh over axis "dp",
``shard_map``-ed sample -> E_loc -> update steps with

  * per-shard ancestral sampling under distinct PRNG keys (duplicate unique
    states across shards are harmless: weighting is count-based),
  * an all-gather of the (tiny: ~16 B/state) sampled wavefunction table so
    every shard computes local energies against the GLOBAL support — better
    E_loc coverage than any single chip,
  * psum'd energy/variance/gradients over ICI; parameters replicated (the
    ansatz is ~1e5 params — no tensor parallelism needed),
  * two optimizers: first-order (optax Adam, make_sharded_train_step) and
    stochastic reconfiguration (make_sharded_sr_step), whose matrix-free
    S@v products psum per-shard jvp/vjp contributions so the CG solve runs
    replicated on every chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.flatten_util import ravel_pytree
from jax.sharding import Mesh, PartitionSpec as P

from naqs_tpu.models.nade import NAQSConfig, log_psi
from naqs_tpu.ops.local_energy import DeviceTerms, local_energy
from naqs_tpu.sampler import sample


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("dp",))


def _keep_unless(flag, new, old):
    """Select old values when flag is set, elementwise over a pytree."""
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(flag, o, n), new, old
    )


def _sample_and_energy(cfg, params, dt, key, n_samples, n_dev, cap,
                       reweight_by_psi=False, table=None,
                       fwd_chunk: int = 65536, sample_beta: float = 1.0):
    """Shared sharded front half: per-shard sample, all-gather the global
    psi table, local energies of local rows against the global support.

    Returns (batch, live, w, e_re, e_im, stats, record) where w sums to 1
    GLOBALLY, stats = (e_mean, e_mean_im, e_var, n_unique_global, overflow),
    and record = (g_states, g_counts, g_n_valid) is the sorted merged sample
    buffer for the host-side sampled-state counter (solve_h history).

    reweight_by_psi: weight rows by |psi|^2 instead of empirical counts.
    Shards sample independently, so a state can appear on several shards;
    count weights partition the true total across duplicates, but |psi|^2
    weights would double-count them — each row's weight is divided by its
    global multiplicity (run length in the merged sorted buffer).

    table=(t_states, t_n): exact-E_loc mode (trainer.TrainConfig.exact_eloc)
    — psi is evaluated over the WHOLE enumerated sector and every coupled
    state resolves against it. The table forward is the expensive part, so
    it is SHARDED: each chip evaluates its contiguous 1/D slice of the
    (replicated, SENTINEL-padded) enumeration and the slices are
    all-gathered (a few MB of (la, ph) f32 over ICI), after which each
    chip's own query rows gather from the full table as usual.
    """
    batch = sample(cfg, params, key, n_samples / n_dev, cap,
                   beta=sample_beta)
    live = jnp.arange(batch.states.shape[0]) < batch.n_unique

    la_l, ph_l = log_psi(cfg, params, batch.states)
    la_l, ph_l = jax.lax.stop_gradient((la_l, ph_l))
    g_states = jax.lax.all_gather(batch.states, "dp").reshape(-1)
    g_la = jax.lax.all_gather(la_l, "dp").reshape(-1)
    g_ph = jax.lax.all_gather(ph_l, "dp").reshape(-1)
    g_live = jax.lax.all_gather(live, "dp").reshape(-1)
    g_counts = jax.lax.all_gather(
        jnp.where(live, batch.counts, 0.0), "dp"
    ).reshape(-1)
    # re-sort the merged buffer (padding SENTINELs sort last)
    order = jnp.argsort(g_states)
    g_states = g_states[order]
    g_la = g_la[order]
    g_ph = g_ph[order]
    g_live_s = g_live[order]
    g_counts = g_counts[order]
    g_n_valid = jnp.sum(g_live).astype(jnp.int32)
    # globally deduplicated unique count: shards sample independently, so
    # the same state may appear on several shards (harmless for count-
    # based weights, but the controller must not see an inflated count)
    new_key = jnp.concatenate(
        [jnp.ones((1,), bool), g_states[1:] != g_states[:-1]]
    )
    n_unique_global = jnp.sum(new_key & g_live_s).astype(jnp.int32)

    # E_loc for the shard's OWN rows only, resolved against the gathered
    # global psi table (SURVEY.md section 2.3(d): each chip expands its
    # own samples). The membership engines chunk over the local cap rows
    # (per-chip gather work = global/D); the dense/factored engines
    # additionally split their term-chunk scan over the mesh and psum the
    # numerator grid, so the engine hot stage scales ~1/D either way.
    if table is not None:
        t_states, t_n = table
        n_pad = t_states.shape[0]
        assert n_pad % n_dev == 0, "table buffer must pad to a D multiple"
        per = n_pad // n_dev
        i0 = jax.lax.axis_index("dp") * per
        my_rows = jax.lax.dynamic_slice_in_dim(t_states, i0, per)
        if per > fwd_chunk and per % fwd_chunk == 0:
            t_la_l, t_ph_l = jax.lax.map(
                lambda s: log_psi(cfg, params, s),
                my_rows.reshape(per // fwd_chunk, fwd_chunk))
            t_la_l = t_la_l.reshape(-1)
            t_ph_l = t_ph_l.reshape(-1)
        else:
            t_la_l, t_ph_l = log_psi(cfg, params, my_rows)
        t_la_l, t_ph_l = jax.lax.stop_gradient((t_la_l, t_ph_l))
        t_la = jax.lax.all_gather(t_la_l, "dp").reshape(-1)
        t_ph = jax.lax.all_gather(t_ph_l, "dp").reshape(-1)
        lookup = (t_states, t_la, t_ph, t_n)
    else:
        lookup = (g_states, g_la, g_ph, g_n_valid)
    e_re_l, e_im_l = local_energy(
        dt, *lookup,
        queries=(batch.states, la_l, ph_l),
        axis_name="dp", axis_size=n_dev,
    )
    e_re = jnp.where(live, e_re_l, 0.0)
    e_im = jnp.where(live, e_im_l, 0.0)

    if reweight_by_psi:
        mult = (jnp.searchsorted(g_states, batch.states, side="right",
                                 method="sort") -
                jnp.searchsorted(g_states, batch.states, side="left",
                                 method="sort"))
        raw = jnp.where(
            live,
            jnp.exp(2.0 * la_l.astype(jnp.float64))
            / jnp.maximum(mult, 1).astype(jnp.float64),
            0.0,
        )
    else:
        raw = jnp.where(live, batch.counts, 0.0)
    total = jax.lax.psum(jnp.sum(raw), "dp")
    w = raw / total
    e_mean = jax.lax.psum(jnp.sum(w * e_re), "dp")
    e_mean_im = jax.lax.psum(jnp.sum(w * e_im), "dp")
    e_var = jax.lax.psum(jnp.sum(w * (e_re - e_mean) ** 2), "dp")
    overflow = jax.lax.psum(batch.overflow.astype(jnp.int32), "dp") > 0
    stats = (e_mean, e_mean_im, e_var, n_unique_global, overflow)
    record = (g_states, g_counts, g_n_valid)
    return batch, live, w, e_re, e_im, stats, record


def make_sharded_train_step(
    cfg: NAQSConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    capacity_per_device: int,
    table=None,
    fwd_chunk: int = 65536,
    reweight_by_psi: bool = False,
    sample_beta: float = 1.0,
):
    """Returns jitted step(params, opt_state, dt, keys, n_samples) ->
    (params, opt_state, metrics). `keys` must be jax.random.split(key, D).

    params/opt_state/dt replicated; keys sharded over "dp". On capacity
    overflow the (biased) update is withheld — the host controller backs
    off n_samples and resamples, matching the single-chip get_samples
    semantics (reference energy.py:943-969).

    table=(t_states, t_n): exact-E_loc mode — the full-sector psi table
    forward is sharded over the mesh and all-gathered (see
    _sample_and_energy). t_states must be SENTINEL-padded to a multiple
    of D * fwd_chunk (or of D, below one chunk per chip).
    """
    n_dev = mesh.devices.size
    if table is not None:
        table = (jnp.asarray(table[0]), jnp.int32(table[1]))

    def _device_step(params, opt_state, dt: DeviceTerms, keys, n_samples):
        batch, live, w, e_re, e_im, stats, record = _sample_and_energy(
            cfg, params, dt, keys[0], n_samples, n_dev, capacity_per_device,
            reweight_by_psi=reweight_by_psi, table=table, fwd_chunk=fwd_chunk,
            sample_beta=sample_beta,
        )
        e_mean, e_mean_im, e_var, n_unique_global, overflow = stats

        d_re = (e_re - e_mean).astype(jnp.float32)
        d_im = (e_im - e_mean_im).astype(jnp.float32)
        wf = w.astype(jnp.float32)

        def loss_fn(p):
            la, ph = log_psi(cfg, p, batch.states)
            return 2.0 * jnp.sum(wf * (la * d_re + ph * d_im))

        grads = jax.grad(loss_fn)(params)
        grads = jax.lax.psum(grads, "dp")
        new_updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, new_updates)
        params = _keep_unless(overflow, new_params, params)
        opt_state = _keep_unless(overflow, new_opt_state, opt_state)
        metrics = {
            "e_loc": e_mean,
            "e_loc_var": e_var,
            "n_unique": n_unique_global,
            "overflow": overflow,
            # merged sample buffer for the host-side counter (solve_h
            # history); replicated, transferred only every RECORD_FREQ steps
            "rec_states": record[0],
            "rec_counts": record[1],
            "rec_n_valid": record[2],
        }
        return params, opt_state, metrics

    sharded = jax.shard_map(
        _device_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("dp"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_kfac_step(
    cfg: NAQSConfig,
    mesh: Mesh,
    capacity_per_device: int,
):
    """Data-parallel KFAC step (kfac.py, psum'd Kronecker factors).

    Returns jitted step(params, kstate, dt, keys, n_samples, lr, damping,
    decay, kl_clip) -> (params, kstate, metrics). Factor second moments
    A/G, parameter gradients and the KL-clip inner product are psum'd over
    the mesh, so every chip computes the identical preconditioned update;
    the running-average factor state stays replicated bit-for-bit.
    """
    from naqs_tpu.kfac import kfac_apply

    n_dev = mesh.devices.size

    def _device_step(params, kstate, dt: DeviceTerms, keys, n_samples,
                     lr, damping, decay, kl_clip):
        batch, live, w, e_re, e_im, stats, record = _sample_and_energy(
            cfg, params, dt, keys[0], n_samples, n_dev, capacity_per_device
        )
        e_mean, e_mean_im, e_var, n_unique_global, overflow = stats
        new_params, new_kstate, m = kfac_apply(
            cfg, params, kstate, batch.states, w,
            e_re - e_mean, e_im - e_mean_im,
            lr, damping, decay, kl_clip,
            psum=lambda t: jax.lax.psum(t, "dp"),
        )
        params = _keep_unless(overflow, new_params, params)
        kstate = _keep_unless(overflow, new_kstate, kstate)
        metrics = {
            "e_loc": e_mean,
            "e_loc_var": e_var,
            "n_unique": n_unique_global,
            "overflow": overflow,
            "nu": m["nu"],
            "rec_states": record[0],
            "rec_counts": record[1],
            "rec_n_valid": record[2],
        }
        return params, kstate, metrics

    sharded = jax.shard_map(
        _device_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("dp"), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_sr_step(
    cfg: NAQSConfig,
    mesh: Mesh,
    capacity_per_device: int,
    cg_iters: int = 50,
    reweight_by_psi: bool = False,
    kl_clip=None,
    fisher_mix: float = 0.0,
):
    """Stochastic-reconfiguration step over the mesh (sr.py, data-parallel).

    Returns jitted step(params, dt, keys, n_samples, lr, damping) ->
    (params, metrics). The quantum-Fisher matvec S@v psums per-shard
    jvp/vjp contributions, so conjugate gradients runs on identical
    replicated values on every chip. reweight_by_psi / kl_clip mirror
    sr.sr_update (the sampled-SR HF-collapse mitigations).
    """
    n_dev = mesh.devices.size

    def _device_step(params, dt: DeviceTerms, keys, n_samples, lr, damping):
        flat0, unravel = ravel_pytree(params)
        batch, live, w, e_re, e_im, stats, record = _sample_and_energy(
            cfg, params, dt, keys[0], n_samples, n_dev, capacity_per_device,
            reweight_by_psi=reweight_by_psi,
        )
        e_mean, e_mean_im, e_var, n_unique_global, overflow = stats
        d_re = e_re - e_mean
        d_im = e_im - e_mean_im

        def f(flat):
            la, ph = log_psi(cfg, unravel(flat), batch.states)
            return la.astype(jnp.float64), ph.astype(jnp.float64)

        _, vjp = jax.vjp(f, flat0)
        grad = jax.lax.psum(
            (2.0 * vjp((w * d_re, w * d_im))[0]).astype(flat0.dtype), "dp"
        )
        damping = damping.astype(flat0.dtype)

        if fisher_mix > 0.0:
            # support-regularized metric (sr.sr_update fisher_mix): mix a
            # uniform distribution over the GLOBAL live support into the
            # Fisher weights only — gradient weights stay unbiased
            n_live = jnp.maximum(
                jax.lax.psum(jnp.sum(live.astype(jnp.float64)), "dp"), 1.0)
            w_f = (1.0 - fisher_mix) * w + fisher_mix * live / n_live
        else:
            w_f = w

        def s_matvec(v):
            u_la, u_ph = jax.jvp(f, (flat0,), (v,))[1]
            u_la = u_la - jax.lax.psum(jnp.sum(w_f * u_la), "dp")
            u_ph = u_ph - jax.lax.psum(jnp.sum(w_f * u_ph), "dp")
            sv = jax.lax.psum(
                vjp((w_f * u_la, w_f * u_ph))[0].astype(flat0.dtype), "dp"
            )
            return sv + damping * v

        x, _ = jax.scipy.sparse.linalg.cg(
            s_matvec, grad, x0=grad, maxiter=cg_iters, tol=1e-10
        )
        lr = lr.astype(flat0.dtype)
        if kl_clip is not None:
            # trust region on the natural step length (replicated: every
            # input to the quadratic form is already psum'd)
            q = jnp.maximum(x @ s_matvec(x), 1e-300)
            lr = lr * jnp.minimum(
                1.0, jnp.sqrt(jnp.float64(kl_clip).astype(flat0.dtype)
                              / (lr * lr * q)))
        new_flat = flat0 - lr * x
        params = _keep_unless(overflow, unravel(new_flat), params)
        metrics = {
            "e_loc": e_mean,
            "e_loc_var": e_var,
            "n_unique": n_unique_global,
            "overflow": overflow,
            "grad_norm": jnp.linalg.norm(grad),
            "rec_states": record[0],
            "rec_counts": record[1],
            "rec_n_valid": record[2],
        }
        return params, metrics

    sharded = jax.shard_map(
        _device_step,
        mesh=mesh,
        in_specs=(P(), P(), P("dp"), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
