"""Device sketch builder vs the host builder: exact table equality."""

import numpy as np

from rattle_tpu.ops.sketch import build_sketch_tables
from rattle_tpu.ops.sketch_device import build_device_sketch
from tests.conftest import make_read


def _reads(rng, n=40, lo=40, hi=300):
    return [make_read(rng, int(rng.integers(lo, hi))) for _ in range(n)]


def _unpack_words(words):
    n = words.shape[0]
    plane = np.zeros((n, 4096), np.int8)
    for b in range(32):
        plane[:, b::32] = 0  # layout check below uses word-major order
    for w in range(128):
        for b in range(32):
            plane[:, w * 32 + b] = (words[:, w] >> b) & 1
    return plane


def test_device_matches_host_forward(rng):
    seqs = _reads(rng)
    host = build_sketch_tables(seqs, 10, False, use_native=False)
    dev = build_device_sketch(seqs, 10, False, kmax=host.kmax)
    n = len(seqs)
    np.testing.assert_array_equal(np.asarray(dev.hbp)[:n], host.hbp)
    np.testing.assert_array_equal(np.asarray(dev.hs)[:n], host.hs)
    np.testing.assert_array_equal(np.asarray(dev.nk)[:n], host.nk)
    np.testing.assert_array_equal(np.asarray(dev.bvc)[:n], host.bvc)
    np.testing.assert_array_equal(_unpack_words(host.bvp),
                                  np.asarray(dev.plane)[:n])
    # ps must agree wherever hashes are unique; overall (hash,pos) pairing
    # must match exactly after re-sorting ties the same way (both stable)
    np.testing.assert_array_equal(np.asarray(dev.ps)[:n], host.ps)


def test_device_matches_host_both_strands(rng):
    seqs = _reads(rng, n=24)
    host = build_sketch_tables(seqs, 11, True, use_native=False)
    dev = build_device_sketch(seqs, 11, True, kmax=host.kmax)
    n = len(seqs)
    np.testing.assert_array_equal(np.asarray(dev.rev_hs)[:n], host.rev_hs)
    np.testing.assert_array_equal(np.asarray(dev.rev_ps)[:n], host.rev_ps)
    np.testing.assert_array_equal(_unpack_words(host.rev_bvp),
                                  np.asarray(dev.rev_plane)[:n])


def test_padding_rows_are_inert(rng):
    seqs = _reads(rng, n=10)
    dev = build_device_sketch(seqs, 10, False, n_pad_to=16)
    assert dev.hbp.shape[0] == 16
    pad = np.asarray(dev.plane)[10:]
    assert (pad == 0).all()
    assert (np.asarray(dev.nk)[10:] == 0).all()
    assert (np.asarray(dev.hs)[10:] == 0xFFFFFFFF).all()
