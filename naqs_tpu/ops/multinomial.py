"""Vectorized 4-way multinomial splitting via a binomial cascade.

On-device port of the reference's numpy multinomial_arr (nade.py:20-37):
splits each frontier state's sample count over its 4 child occupations.
Counts are float64 (sample counts reach 1e12, exactly representable).

The binomial sampler is hand-rolled for TPU: jax.random.binomial's
rejection sampler compiles to enormous f64-transcendental-heavy programs on
TPU (and crashes the Mosaic pipeline at this time). Instead:
  * variance > 25: Gaussian approximation (error < 1e-3 in distribution,
    far below VMC sampling noise),
  * else: exact inverse-CDF over a 128-wide support window using the pmf
    ratio recurrence (covers both small-n binomial and the huge-n/small-p
    Poisson limit in one formula), with the p > 1/2 flip trick so the
    window always starts at 0.
Per-row sums are conserved exactly by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SMALL_SUPPORT = 128
_GAUSS_VAR_MIN = 25.0


def binomial(key, n: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Sample k ~ Binomial(n, p) elementwise. n: f64 counts >= 0, p in [0,1]."""
    n = n.astype(jnp.float64)
    p64 = jnp.clip(p.astype(jnp.float64), 0.0, 1.0)

    # flip so effective p <= 1/2 (keeps the small-support window at 0)
    flip = p64 > 0.5
    q = jnp.where(flip, 1.0 - p64, p64)

    mean = n * q
    var = mean * (1.0 - q)

    k_norm, k_unif = jax.random.split(key)

    # --- Gaussian branch
    z = jax.random.normal(k_norm, n.shape, dtype=jnp.float32).astype(jnp.float64)
    gauss = jnp.round(mean + jnp.sqrt(jnp.maximum(var, 0.0)) * z)

    # --- inverse-CDF branch over k = 0..127 (f32 pmf arithmetic)
    u = jax.random.uniform(k_unif, n.shape, dtype=jnp.float32)
    log_pmf0 = (n * jnp.log1p(-jnp.minimum(q, 1.0 - 1e-15))).astype(jnp.float32)
    pmf = jnp.exp(log_pmf0)
    nf = n.astype(jnp.float32)
    qf = q.astype(jnp.float32)
    odds = qf / jnp.maximum(1.0 - qf, 1e-30)

    def body(k, carry):
        pmf, cdf, out = carry
        kf = k.astype(jnp.float32)
        pmf = pmf * jnp.maximum(nf - kf + 1.0, 0.0) / kf * odds
        out = out + (u > cdf)
        cdf = cdf + pmf
        return pmf, cdf, out

    _, _, small = jax.lax.fori_loop(
        1,
        _SMALL_SUPPORT,
        body,
        (pmf, pmf, jnp.zeros(n.shape, jnp.float32)),
    )
    small = small.astype(jnp.float64)

    k = jnp.where(var > _GAUSS_VAR_MIN, gauss, small)
    k = jnp.clip(k, 0.0, n)
    k = jnp.where(q <= 0.0, 0.0, jnp.where(q >= 1.0, n, k))
    return jnp.where(flip, n - k, k)


def multinomial4(key, counts: jnp.ndarray, probs: jnp.ndarray) -> jnp.ndarray:
    """counts: (U,) f64 >= 0; probs: (U, 4) >= 0 (need not be normalized).

    Returns (U, 4) f64 child counts with per-row sums preserved:
    out[u] ~ Multinomial(counts[u], probs[u]/sum(probs[u])).
    Rows with all-zero probs put their full count on child 0.
    """
    counts = counts.astype(jnp.float64)
    p = probs.astype(jnp.float64)
    ps = jnp.cumsum(p, axis=-1)
    condp = jnp.where(ps > 0, p / jnp.maximum(ps, 1e-300), 0.0)

    out = []
    rem = counts
    keys = jax.random.split(key, 3)
    for i in (3, 2, 1):
        c = binomial(keys[3 - i], rem, condp[:, i])
        c = jnp.minimum(c, rem)  # guard fp edge cases
        out.append(c)
        rem = rem - c
    out.append(rem)
    return jnp.stack(out[::-1], axis=-1)
