"""Sort-merge join vs the binary-search join: identical contract."""

import numpy as np
import jax.numpy as jnp

from rattle_tpu.ops.join_device import join_counts, sorted_join_expand
from rattle_tpu.ops.similarity import _expand_matches


def _tables(rng, b, w, hash_space=400, maxpos=500):
    """Random sorted tables shaped like sketch output (with duplicates)."""
    nk = rng.integers(1, w + 1, size=b).astype(np.int32)
    hbp = rng.integers(0, hash_space, size=(b, w)).astype(np.uint32)
    cols = np.arange(w)[None, :]
    hbp = np.where(cols < nk[:, None], hbp, 0xFFFFFFFF).astype(np.uint32)
    order = np.argsort(np.where(cols < nk[:, None], hbp, 0xFFFFFFFF),
                       axis=1, kind="stable")
    hs = np.take_along_axis(hbp, order, axis=1)
    ps = np.where(np.take_along_axis(cols + np.zeros_like(hbp, np.int64),
                                     order, axis=1) < nk[:, None],
                  order, 0).astype(np.int32)
    ps = np.where(cols < nk[:, None], ps, 0).astype(np.int32)
    return hbp, hs, ps, nk


def test_join_matches_reference_expand():
    rng = np.random.default_rng(0)
    b, w, m = 64, 96, 64
    hbp_a, hs_a, ps_a, nk_a = _tables(rng, b, w)
    _hbp_b, hs_b, ps_b, nk_b = _tables(rng, b, w)
    ref_p1, ref_p2, ref_tot = _expand_matches(
        jnp.asarray(hbp_a), jnp.asarray(nk_a), jnp.asarray(hs_b),
        jnp.asarray(ps_b), jnp.asarray(nk_b), m)
    got_p1, got_p2, got_tot = sorted_join_expand(
        jnp.asarray(hs_a), jnp.asarray(ps_a), jnp.asarray(nk_a),
        jnp.asarray(hs_b), jnp.asarray(ps_b), jnp.asarray(nk_b), m)
    np.testing.assert_array_equal(np.asarray(ref_tot), np.asarray(got_tot))
    # overflowing rows keep a DIFFERENT m_cap-subset (hash order vs pos
    # order) — they are always escalated to a bigger tier, so compare only
    # rows that fit
    tot = np.asarray(ref_tot)
    for i in range(b):
        if tot[i] > m:
            continue
        np.testing.assert_array_equal(np.asarray(ref_p1)[i, :tot[i]],
                                      np.asarray(got_p1)[i, :tot[i]])
        np.testing.assert_array_equal(np.asarray(ref_p2)[i, :tot[i]],
                                      np.asarray(got_p2)[i, :tot[i]])
        np.testing.assert_array_equal(np.asarray(got_p2)[i, tot[i]:],
                                      2**31 - 1)


def test_join_counts_matches():
    rng = np.random.default_rng(1)
    b, w = 48, 80
    hbp_a, hs_a, ps_a, nk_a = _tables(rng, b, w, hash_space=200)
    _b2, hs_b, ps_b, nk_b = _tables(rng, b, w, hash_space=200)
    ref = _expand_matches(jnp.asarray(hbp_a), jnp.asarray(nk_a),
                          jnp.asarray(hs_b), jnp.asarray(ps_b),
                          jnp.asarray(nk_b), 16)[2]
    got = join_counts(jnp.asarray(hs_a), jnp.asarray(nk_a),
                      jnp.asarray(hs_b), jnp.asarray(nk_b))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_join_mixed_widths():
    rng = np.random.default_rng(2)
    b = 32
    hbp_a, hs_a, ps_a, nk_a = _tables(rng, b, 64)
    _b2, hs_b, ps_b, nk_b = _tables(rng, b, 128)
    ref_p1, ref_p2, ref_tot = _expand_matches(
        jnp.asarray(np.pad(hbp_a, ((0, 0), (0, 64)),
                           constant_values=0xFFFFFFFF)),
        jnp.asarray(nk_a), jnp.asarray(hs_b), jnp.asarray(ps_b),
        jnp.asarray(nk_b), 32)
    got_p1, got_p2, got_tot = sorted_join_expand(
        jnp.asarray(hs_a), jnp.asarray(ps_a), jnp.asarray(nk_a),
        jnp.asarray(hs_b), jnp.asarray(ps_b), jnp.asarray(nk_b), 32)
    np.testing.assert_array_equal(np.asarray(ref_tot), np.asarray(got_tot))
    tot = np.asarray(ref_tot)
    for i in range(b):
        if tot[i] > 32:
            continue
        np.testing.assert_array_equal(np.asarray(ref_p1)[i, :tot[i]],
                                      np.asarray(got_p1)[i, :tot[i]])
        np.testing.assert_array_equal(np.asarray(ref_p2)[i, :tot[i]],
                                      np.asarray(got_p2)[i, :tot[i]])


def test_merge_join_matches_sort_join(rng):
    """Bitonic merge join == full-sort join on random sorted tables."""
    import jax.numpy as jnp
    from rattle_tpu.ops.join_device import (merge_join_counts,
                                            merge_join_expand,
                                            sorted_join_expand)
    B, W = 16, 256
    for m_cap in (32, 128):
        hs_a = np.sort(rng.integers(0, 500, (B, W)).astype(np.uint32), axis=1)
        hs_b = np.sort(rng.integers(0, 500, (B, W)).astype(np.uint32), axis=1)
        ps_a = rng.integers(0, 3000, (B, W)).astype(np.int32)
        ps_b = rng.integers(0, 3000, (B, W)).astype(np.int32)
        nk_a = rng.integers(1, W + 1, (B,)).astype(np.int32)
        nk_b = rng.integers(1, W + 1, (B,)).astype(np.int32)
        args = (jnp.asarray(hs_a), jnp.asarray(ps_a), jnp.asarray(nk_a),
                jnp.asarray(hs_b), jnp.asarray(ps_b), jnp.asarray(nk_b))
        p1m, p2m, tm = merge_join_expand(*args, m_cap)
        p1s, p2s, ts = sorted_join_expand(*args, m_cap, packed=True)
        np.testing.assert_array_equal(np.asarray(tm), np.asarray(ts))
        # exact pair equality is only contractual when the pair FITS m_cap
        # (overflow rows are undecided: count-first routing sends them to
        # the host scorer); see merge_join_expand docstring
        fits = np.asarray(ts) <= m_cap
        np.testing.assert_array_equal(np.asarray(p1m)[fits],
                                      np.asarray(p1s)[fits])
        np.testing.assert_array_equal(np.asarray(p2m)[fits],
                                      np.asarray(p2s)[fits])
        cm = merge_join_counts(*args)
        np.testing.assert_array_equal(np.asarray(cm), np.asarray(ts))
