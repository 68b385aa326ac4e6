"""Pallas gate kernel vs the popcount reference (interpret mode on CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from rattle_tpu.ops.pallas_kernels import POOL_TILE, bv_common_matmul  # noqa: E402


def _ref_common(bvp_pool, bvp_seed):
    anded = bvp_pool[:, None, :] & bvp_seed[None, :, :]
    return np.bitwise_count(anded).sum(axis=2, dtype=np.int64)


def test_bv_common_matmul_matches_popcount():
    rng = np.random.default_rng(0)
    p, s = POOL_TILE, 64
    bvp_pool = rng.integers(0, 2**32, size=(p, 128), dtype=np.uint32)
    bvp_seed = rng.integers(0, 2**32, size=(s, 128), dtype=np.uint32)
    # realistic sparsity too: most reads set ~hundreds of 6-mers
    mask = rng.random((p, 128)) < 0.3
    bvp_pool = np.where(mask, bvp_pool, 0).astype(np.uint32)

    out = np.asarray(bv_common_matmul(jnp.asarray(bvp_pool),
                                      jnp.asarray(bvp_seed), interpret=True))
    ref = _ref_common(bvp_pool, bvp_seed)
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out, ref)


def test_bv_common_matmul_multi_tile_and_padding():
    rng = np.random.default_rng(1)
    p, s = 2 * POOL_TILE, 8
    bvp_pool = rng.integers(0, 2**32, size=(p, 128), dtype=np.uint32)
    bvp_pool[-3:] = 0  # zero padding rows are inert
    bvp_seed = rng.integers(0, 2**32, size=(s, 128), dtype=np.uint32)
    out = np.asarray(bv_common_matmul(jnp.asarray(bvp_pool),
                                      jnp.asarray(bvp_seed), interpret=True))
    np.testing.assert_array_equal(out, _ref_common(bvp_pool, bvp_seed))
    assert (out[-3:] == 0).all()
