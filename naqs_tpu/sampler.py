"""Exact autoregressive ancestral sampling over unique states, jitted.

The reference's biggest scaling idea — sample counts over UNIQUE
configurations so cost scales with support size, not sample count
(nade.py:632-736) — re-built as a ``lax.scan`` over orbital shells with
fixed-capacity padded frontier buffers. The ragged ``repeat_interleave``
frontier growth of the reference becomes a sort-based compaction into a
static-capacity buffer; exceeding capacity sets an overflow flag (the
static-shape equivalent of MaxBatchSizeExceededError, nade.py:39,710-712),
which the host-side controller answers by shrinking the sample count.

Gradient flow: unlike the reference (which threads autograd through the
sampling loop, nade.py:714-723), sampling is gradient-free here; log_psi is
re-evaluated afterwards by the parallel predict pass for the loss — it is
mathematically identical and much cheaper on TPU (SURVEY.md section 7).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from naqs_tpu.models.nade import NAQSConfig, amp_conditional_shell
from naqs_tpu.ops.multinomial import multinomial4
from naqs_tpu.utils.bits import SENTINEL


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class SampleBatch:
    """Fixed-capacity unique-sample buffer (sorted by packed state)."""

    states: jnp.ndarray    # (cap,) uint64, SENTINEL-padded, ascending
    counts: jnp.ndarray    # (cap,) f64 multiplicities (0 on padding)
    n_unique: jnp.ndarray  # () int32
    overflow: jnp.ndarray  # () bool — frontier exceeded capacity

    def tree_flatten(self):
        return ((self.states, self.counts, self.n_unique, self.overflow), None)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


def _compact_children(a, b, child_weights, child_valid, j, cap):
    """Scatter the valid (parent, occupation) children of a (cap, 4) frontier
    expansion into a fresh cap-sized buffer, preserving order.

    A cumsum-scatter, not a sort: compiles lean on TPU and keeps padding
    all-zero. Children beyond capacity are dropped (callers flag overflow
    via the returned n_children).
    """
    flat_w = child_weights.reshape(-1)
    flat_valid = child_valid.reshape(-1)
    n_children = jnp.sum(flat_valid)
    dest = jnp.cumsum(flat_valid.astype(jnp.int32)) - 1
    dest = jnp.where(flat_valid, jnp.minimum(dest, cap), cap)  # dummy slot cap

    parent = jax.lax.broadcasted_iota(jnp.int32, (cap, 4), 0).reshape(-1)
    occ = jax.lax.broadcasted_iota(jnp.int32, (cap, 4), 1).reshape(-1).astype(jnp.uint32)
    ju = j.astype(jnp.uint32)
    a_vals = a[parent] | ((occ & jnp.uint32(1)) << ju)
    b_vals = b[parent] | ((occ >> jnp.uint32(1)) << ju)

    a_new = jnp.zeros((cap + 1,), a.dtype).at[dest].set(a_vals)[:cap]
    b_new = jnp.zeros((cap + 1,), b.dtype).at[dest].set(b_vals)[:cap]
    w_new = jnp.zeros((cap + 1,), flat_w.dtype).at[dest].set(flat_w)[:cap]
    valid_new = jnp.arange(cap) < jnp.minimum(n_children, cap)
    return a_new, b_new, w_new, valid_new, n_children


@partial(jax.jit, static_argnames=("cfg", "capacity", "beta"))
def sample(
    cfg: NAQSConfig,
    params,
    key,
    n_samples: jnp.ndarray,
    capacity: int,
    beta: float = 1.0,
) -> SampleBatch:
    """Draw `n_samples` (traced f64 scalar) ancestral samples.

    Returns up to `capacity` unique states with multiplicities. Under
    partial/none masking, unphysical samples are discarded (counts drop),
    matching reference semantics (nade.py:694-695).

    `beta` (static) tempers the per-shell sampling conditionals to
    p_j^beta (renormalized): beta < 1 widens sampled support into the
    |psi|^2 tail. Counts are then multiplicities under the TEMPERED
    distribution — consumers MUST switch to exact |psi|^2 weighting
    (reweight_by_psi) for unbiased expectations. Beyond-reference
    extension: targets the tail gradient-starvation mechanism measured in
    docs/ENGINE_NOTES.md "anatomy of the from-scratch stall"; with
    reweight_by_psi + exact E_loc the estimator equals the |psi|^2-weighted
    gradient truncated to the (widened) support, so it is exact as support
    coverage -> 1.
    """
    s = cfg.n_shells
    cap = capacity

    a0 = jnp.zeros((cap,), dtype=jnp.uint32)
    b0 = jnp.zeros((cap,), dtype=jnp.uint32)
    counts0 = jnp.zeros((cap,), dtype=jnp.float64).at[0].set(n_samples)
    valid0 = jnp.zeros((cap,), dtype=bool).at[0].set(True)
    overflow0 = jnp.array(False)

    shell_keys = jax.random.split(key, s)

    def step(carry, inp):
        a, b, counts, valid, overflow = carry
        j, kj = inp

        shells = jnp.arange(s, dtype=jnp.uint32)
        alpha = ((a[:, None] >> shells) & jnp.uint32(1)).astype(jnp.int32)
        beta_bits = ((b[:, None] >> shells) & jnp.uint32(1)).astype(jnp.int32)

        log_amp4, mask, probs = amp_conditional_shell(cfg, params, j, alpha, beta_bits)
        if beta != 1.0:
            # log-space tempering: masked options carry log_amp -> -inf so
            # exp gives exact zeros; renormalize over the valid options
            pt = jnp.exp(2.0 * beta * log_amp4.astype(jnp.float64))
            probs = (pt / jnp.maximum(jnp.sum(pt, axis=-1, keepdims=True),
                                      1e-300)).astype(probs.dtype)
        child_counts = multinomial4(kj, counts, probs)        # (cap, 4)
        child_counts = child_counts * mask                    # drop unphysical
        child_valid = (child_counts > 0) & valid[:, None]

        new = _compact_children(a, b, child_counts, child_valid, j, cap)
        a, b, counts, new_valid, n_children = new
        overflow = overflow | (n_children > cap)
        return (a, b, counts, new_valid, overflow), None

    (a, b, counts, valid, overflow), _ = jax.lax.scan(
        step,
        (a0, b0, counts0, valid0, overflow0),
        (jnp.arange(s, dtype=jnp.int32), shell_keys),
    )

    # pack model-order spin ints into state-order uint64 bitstrings
    order = np.asarray(cfg.shell_order)
    wa = jnp.asarray((np.uint64(1) << (2 * order.astype(np.uint64))), dtype=jnp.uint64)
    wb = jnp.asarray(
        (np.uint64(1) << (2 * order.astype(np.uint64) + np.uint64(1))), dtype=jnp.uint64
    )
    shells = jnp.arange(s, dtype=jnp.uint32)
    alpha = ((a[:, None] >> shells) & jnp.uint32(1)).astype(jnp.uint64)
    beta = ((b[:, None] >> shells) & jnp.uint32(1)).astype(jnp.uint64)
    states = jnp.sum(alpha * wa + beta * wb, axis=-1, dtype=jnp.uint64)
    states = jnp.where(valid, states, jnp.uint64(SENTINEL))

    perm = jnp.argsort(states)
    states = states[perm]
    counts = jnp.where(valid[perm], counts[perm], 0.0)
    n_unique = jnp.sum(valid).astype(jnp.int32)

    return SampleBatch(states=states, counts=counts, n_unique=n_unique, overflow=overflow)


@partial(jax.jit, static_argnames=("cfg", "capacity"))
def sample_density(
    cfg: NAQSConfig,
    params,
    d_p: jnp.ndarray,
    capacity: int,
) -> SampleBatch:
    """Deterministic density sampling: enumerate every configuration whose
    probability mass exceeds `d_p` (beam search over shells).

    The TPU-native equivalent of the reference's DensitySamplingOptimizer
    support (energy.py:1058-1205; the sample_dP model path). Returned
    `counts` hold the probability mass |psi|^2 of each state (not sample
    multiplicities); overflow flags a beam wider than `capacity`.
    """
    s = cfg.n_shells
    cap = capacity

    a0 = jnp.zeros((cap,), dtype=jnp.uint32)
    b0 = jnp.zeros((cap,), dtype=jnp.uint32)
    prob0 = jnp.zeros((cap,), dtype=jnp.float64).at[0].set(1.0)
    valid0 = jnp.zeros((cap,), dtype=bool).at[0].set(True)

    def step(carry, j):
        a, b, prob, valid, overflow = carry
        shells = jnp.arange(s, dtype=jnp.uint32)
        alpha = ((a[:, None] >> shells) & jnp.uint32(1)).astype(jnp.int32)
        beta = ((b[:, None] >> shells) & jnp.uint32(1)).astype(jnp.int32)
        _, mask, probs = amp_conditional_shell(cfg, params, j, alpha, beta)
        child_prob = prob[:, None] * probs.astype(jnp.float64) * mask
        child_valid = (child_prob >= d_p) & valid[:, None]
        a, b, prob, new_valid, n_children = _compact_children(
            a, b, child_prob, child_valid, j, cap
        )
        overflow = overflow | (n_children > cap)
        return (a, b, prob, new_valid, overflow), None

    (a, b, prob, valid, overflow), _ = jax.lax.scan(
        step, (a0, b0, prob0, valid0, jnp.array(False)),
        jnp.arange(s, dtype=jnp.int32),
    )

    order = np.asarray(cfg.shell_order)
    wa = jnp.asarray((np.uint64(1) << (2 * order.astype(np.uint64))), dtype=jnp.uint64)
    wb = jnp.asarray(
        (np.uint64(1) << (2 * order.astype(np.uint64) + np.uint64(1))), dtype=jnp.uint64
    )
    shells = jnp.arange(s, dtype=jnp.uint32)
    alpha = ((a[:, None] >> shells) & jnp.uint32(1)).astype(jnp.uint64)
    beta = ((b[:, None] >> shells) & jnp.uint32(1)).astype(jnp.uint64)
    states = jnp.sum(alpha * wa + beta * wb, axis=-1, dtype=jnp.uint64)
    states = jnp.where(valid, states, jnp.uint64(SENTINEL))
    perm = jnp.argsort(states)
    return SampleBatch(
        states=states[perm],
        counts=jnp.where(valid[perm], prob[perm], 0.0),
        n_unique=jnp.sum(valid).astype(jnp.int32),
        overflow=overflow,
    )
