"""Correctness of the Pallas VMEM table-gather kernel (interpret mode).

The kernel itself targets Mosaic/TPU; on the CPU CI platform we run it in
pallas interpreter mode against a plain XLA gather oracle.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from naqs_tpu.ops.dyn_gather import pad_tables, table_gather2


@pytest.mark.parametrize("q,t,tile_w,block_rows", [
    (1000, 4096, 512, 8),
    (5000, 2048, 2048, 8),
    (257, 1024, 256, 16),
])
def test_table_gather2_matches_xla(q, t, tile_w, block_rows):
    rng = np.random.default_rng(0)
    la = jnp.asarray(rng.normal(size=(t,)).astype(np.float32))
    ph = jnp.asarray(rng.normal(size=(t,)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, t, size=(q,)).astype(np.int32))
    g_la, g_ph = table_gather2(
        la, ph, idx, tile_w=tile_w, block_rows=block_rows, interpret=True)
    np.testing.assert_array_equal(np.asarray(g_la), np.asarray(la)[idx])
    np.testing.assert_array_equal(np.asarray(g_ph), np.asarray(ph)[idx])


def test_table_gather2_2d_idx_shape():
    rng = np.random.default_rng(1)
    t = 1024
    la = jnp.asarray(rng.normal(size=(t,)).astype(np.float32))
    ph = jnp.asarray(rng.normal(size=(t,)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, t, size=(37, 53)).astype(np.int32))
    g_la, g_ph = table_gather2(
        la, ph, idx, tile_w=512, block_rows=8, interpret=True)
    assert g_la.shape == idx.shape == g_ph.shape
    np.testing.assert_array_equal(np.asarray(g_la),
                                  np.asarray(la)[np.asarray(idx)])


def test_pad_tables_miss_marker():
    table = jnp.stack(
        [jnp.arange(11, dtype=jnp.float32),
         jnp.arange(11, dtype=jnp.float32) * 2], axis=1)
    la, ph = pad_tables(table, size=10, tile_w=8, miss=-1e30)
    assert la.shape == (16,)
    np.testing.assert_array_equal(np.asarray(la[:11]), np.arange(11))
    assert np.all(np.asarray(la[11:]) == -1e30)
    assert np.all(np.asarray(ph[11:]) == 0.0)
