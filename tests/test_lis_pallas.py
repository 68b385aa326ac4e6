"""Fused Pallas LIS kernel vs the XLA select scans (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from rattle_tpu.ops.lis_select import (anchor_filter_select, lis_build_select,
                                       lis_reconstruct_select)
from rattle_tpu.ops.pallas_kernels import lis_filter_pallas
from rattle_tpu.ops.similarity import _variance


def _reference(p1, p2, valid, k, hc):
    p_pred, m_idx, l = lis_build_select(p2, valid)
    s = lis_reconstruct_select(p_pred, m_idx, l)
    a1 = jnp.take_along_axis(p1, s, axis=1)
    a2 = jnp.take_along_axis(p2, s, axis=1)
    bases, hcb, kept, dist = anchor_filter_select(a1, a2, l, k, hc)
    n = jnp.maximum(kept - 1, 0)
    return (np.asarray(bases), np.asarray(hcb), np.asarray(n),
            np.asarray(_variance(dist, n)))


def test_lis_pallas_matches_select():
    rng = np.random.default_rng(0)
    b, m = 16, 48
    for trial in range(4):
        # simulate join output: matches sorted by (p1, p2), pads at the end
        n_valid = rng.integers(0, m + 1, size=b).astype(np.int32)
        p1 = np.sort(rng.integers(0, 300, size=(b, m)), axis=1).astype(np.int32)
        p2 = rng.integers(0, 300, size=(b, m)).astype(np.int32)
        order = np.lexsort((p2, p1), axis=1)
        p1 = np.take_along_axis(p1, order, axis=1)
        p2 = np.take_along_axis(p2, order, axis=1)
        valid = np.arange(m)[None, :] < n_valid[:, None]
        p1 = np.where(valid, p1, 0)
        p2 = np.where(valid, p2, 2**31 - 1)

        ref = _reference(jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(valid),
                         10, 10)
        got = lis_filter_pallas(jnp.asarray(p1), jnp.asarray(p2),
                                jnp.asarray(valid), 10, 10, interpret=True)
        np.testing.assert_array_equal(np.asarray(got[0]), ref[0])  # bases
        np.testing.assert_array_equal(np.asarray(got[1]), ref[1])  # hc
        np.testing.assert_array_equal(np.asarray(got[2]), ref[2])  # n_dist
        np.testing.assert_allclose(np.asarray(got[3]), ref[3],
                                   rtol=1e-5, atol=1e-5)
