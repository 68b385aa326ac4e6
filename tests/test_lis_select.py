"""Select-based LIS scans vs the original gather/scatter scans: bit equality."""

import numpy as np
import jax
import jax.numpy as jnp

from rattle_tpu.ops import similarity as sim
from rattle_tpu.ops.lis_select import (anchor_filter_select, lis_build_select,
                                       lis_reconstruct_select)


def _random_case(rng, b=16, m=64):
    p2 = rng.integers(0, 500, size=(b, m)).astype(np.int32)
    n_valid = rng.integers(0, m + 1, size=b).astype(np.int32)
    valid = np.arange(m)[None, :] < n_valid[:, None]
    p2 = np.where(valid, p2, 2**31 - 1)
    return jnp.asarray(p2), jnp.asarray(valid)


def test_lis_build_and_reconstruct_equal():
    rng = np.random.default_rng(0)
    for _ in range(5):
        p2, valid = _random_case(rng)
        ref = sim._lis_build(p2, valid)
        got = lis_build_select(p2, valid)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
        s_ref = sim._lis_reconstruct(*ref)
        s_got = lis_reconstruct_select(*got)
        np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_got))


def test_anchor_filter_equal():
    rng = np.random.default_rng(1)
    b, m = 8, 48
    for _ in range(5):
        a1 = np.sort(rng.integers(0, 400, size=(b, m)), axis=1).astype(np.int32)
        a2 = np.sort(rng.integers(0, 400, size=(b, m)), axis=1).astype(np.int32)
        l = rng.integers(0, m + 1, size=b).astype(np.int32)
        ref = sim._anchor_filter(jnp.asarray(a1), jnp.asarray(a2),
                                 jnp.asarray(l), 10, 10)
        got = anchor_filter_select(jnp.asarray(a1), jnp.asarray(a2),
                                   jnp.asarray(l), 10, 10)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
