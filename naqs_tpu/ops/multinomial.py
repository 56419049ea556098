"""Vectorized 4-way multinomial splitting via a binomial cascade.

On-device port of the reference's numpy multinomial_arr (nade.py:20-37):
splits each frontier state's sample count over its 4 child occupations.
Counts are float64 (sample counts reach 1e12, exactly representable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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
        c = jax.random.binomial(keys[3 - i], n=rem, p=condp[:, i])
        c = jnp.minimum(c, rem)  # guard fp edge cases
        out.append(c)
        rem = rem - c
    out.append(rem)
    return jnp.stack(out[::-1], axis=-1)
