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
from typing import Tuple

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


@partial(jax.jit, static_argnames=("cfg", "capacity"))
def sample(
    cfg: NAQSConfig,
    params,
    key,
    n_samples: jnp.ndarray,
    capacity: int,
) -> SampleBatch:
    """Draw `n_samples` (traced f64 scalar) ancestral samples.

    Returns up to `capacity` unique states with multiplicities. Under
    partial/none masking, unphysical samples are discarded (counts drop),
    matching reference semantics (nade.py:694-695).
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
        beta = ((b[:, None] >> shells) & jnp.uint32(1)).astype(jnp.int32)

        _, mask, probs = amp_conditional_shell(cfg, params, j, alpha, beta)
        child_counts = multinomial4(kj, counts, probs)        # (cap, 4)
        child_counts = child_counts * mask                    # drop unphysical
        child_valid = (child_counts > 0) & valid[:, None]

        flat_counts = child_counts.reshape(-1)
        flat_valid = child_valid.reshape(-1)
        n_children = jnp.sum(flat_valid)
        overflow = overflow | (n_children > cap)

        # compact: valid children first (stable order irrelevant; final sort later)
        order = jnp.argsort(~flat_valid)[:cap]
        occ = (order % 4).astype(jnp.uint32)
        parent = order // 4
        new_valid = flat_valid[order]
        a = jnp.where(new_valid, a[parent] | ((occ & 1) << j.astype(jnp.uint32)), 0)
        b = jnp.where(new_valid, b[parent] | ((occ >> 1) << j.astype(jnp.uint32)), 0)
        counts = jnp.where(new_valid, flat_counts[order], 0.0)
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
        flat_prob = child_prob.reshape(-1)
        flat_valid = child_valid.reshape(-1)
        overflow = overflow | (jnp.sum(flat_valid) > cap)
        order = jnp.argsort(~flat_valid)[:cap]
        occ = (order % 4).astype(jnp.uint32)
        parent = order // 4
        new_valid = flat_valid[order]
        a = jnp.where(new_valid, a[parent] | ((occ & 1) << j.astype(jnp.uint32)), 0)
        b = jnp.where(new_valid, b[parent] | ((occ >> 1) << j.astype(jnp.uint32)), 0)
        prob = jnp.where(new_valid, flat_prob[order], 0.0)
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
