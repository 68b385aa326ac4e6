"""Device-side k-mer sketch building.

The host-side builders (ops/sketch.py, native C++) materialize ~0.5 GB of
padded tables in host RAM; in this environment first-touch page faults alone
cost tens of seconds, and device->host bandwidth is irrelevant here because
the tables are CONSUMED on device.  So the TPU builds its own tables:

  host: 2-bit-encode reads (cheap, ~1 byte/base)  ->  h2d [N, Lmax] uint8
  device: rolling k-mer hashes (k static adds/shifts)           kmer.hpp:33-40
          per-row stable sort by hash -> (hs, ps)               kmer.cpp:39-40
          6-mer presence bit plane [N, 4096] int8               kmer.hpp:14-16
          set-bit counts bvc

Semantics identical to ops/sketch.build_sketch_tables (PAD_HASH padding,
position range [0, L-k), bitvector range [0, L-6)); tests assert exact
equality against the host builder.

The bit plane is kept UNPACKED on device — it feeds the all-pairs gate
matmul (cluster.cpp:13-19 as an MXU contraction, see cluster/bulk.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .encode import BASE_TO_CODE
from .sketch import BV_KMER, BV_SIZE, PAD_HASH

PAD = int(PAD_HASH)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@dataclass
class DeviceSketch:
    """Device-resident tables (+ tiny host copies of the scalars)."""

    hbp: jax.Array          # [N, K] uint32, hash at each position
    hs: jax.Array           # [N, K] uint32, sorted by (hash, pos)
    ps: jax.Array           # [N, K] int32, positions co-sorted with hs
    plane: jax.Array        # [N, 4096] int8 6-mer presence bits
    nk: jax.Array           # [N] int32
    lens: jax.Array         # [N] int32
    bvc: jax.Array          # [N] int32
    rev_hs: Optional[jax.Array] = None
    rev_ps: Optional[jax.Array] = None
    rev_plane: Optional[jax.Array] = None
    nk_host: Optional[np.ndarray] = None
    lens_host: Optional[np.ndarray] = None
    bvc_host: Optional[np.ndarray] = None
    n_real: int = 0
    kmer_size: int = 10

    @property
    def kmax(self) -> int:
        return self.hbp.shape[1]


def encode_batch(seqs: List[str], l_pad: int, n_pad: int) -> np.ndarray:
    """[n_pad, l_pad] uint8 code matrix (pad rows/tails are code 0)."""
    out = np.zeros((n_pad, l_pad), dtype=np.uint8)
    for i, s in enumerate(seqs):
        raw = np.frombuffer(s.encode("ascii"), dtype=np.uint8)
        out[i, : len(raw)] = BASE_TO_CODE[raw]
    return out


@functools.partial(jax.jit, static_argnames=("k", "kmax"))
def _device_tables(codes, nk, lens, k: int, kmax: int):
    """codes [N, kmax + k] uint8 -> (hbp, hs, ps, plane, bvc)."""
    n = codes.shape[0]
    c = codes.astype(jnp.uint32)

    # rolling k-mer hash, big-endian shift (kmer.hpp:33-40)
    h = jnp.zeros((n, kmax), jnp.uint32)
    for t in range(k):
        h = (h << 2) | jax.lax.slice(c, (0, t), (n, t + kmax))
    mask = (jnp.uint32(0xFFFFFFFF) if k >= 16
            else jnp.uint32((1 << (2 * k)) - 1))
    h = h & mask
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, kmax), 1)
    valid = pos < nk[:, None]
    hbp = jnp.where(valid, h, jnp.uint32(PAD))
    hs, ps = jax.lax.sort_key_val(hbp, pos, dimension=1)  # stable -> (hash,pos)
    # stability puts the pad entries (pos >= nk) in the trailing slots even
    # when a real k=16 hash equals PAD_HASH; zero them like the host builder
    ps = jnp.where(valid, ps, 0)

    # 6-mer presence plane over [0, L-6) (kmer.cpp:30-37)
    h6 = jnp.zeros((n, kmax), jnp.uint32)
    for t in range(BV_KMER):
        h6 = (h6 << 2) | jax.lax.slice(c, (0, t), (n, t + kmax))
    h6 = h6 & jnp.uint32(BV_SIZE - 1)
    bv_valid = pos < (lens[:, None] - BV_KMER)
    h6 = jnp.where(bv_valid, h6, jnp.uint32(BV_SIZE)).astype(jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, kmax), 0)
    plane = jnp.zeros((n, BV_SIZE + 1), jnp.int8)
    plane = plane.at[rows, h6].max(jnp.int8(1))[:, :BV_SIZE]
    bvc = plane.sum(axis=1, dtype=jnp.int32)
    return hbp, hs, ps, plane, bvc


@functools.partial(jax.jit, static_argnames=())
def _revcomp_codes_batch(codes, lens):
    """Per-row reverse complement in code space (reverse first L, XOR 2)."""
    n, l = codes.shape
    j = jax.lax.broadcasted_iota(jnp.int32, (n, l), 1)
    src = lens[:, None] - 1 - j
    rc = jnp.take_along_axis(codes, jnp.clip(src, 0, l - 1).astype(jnp.int32),
                             axis=1) ^ jnp.uint8(2)
    return jnp.where(src >= 0, rc, jnp.uint8(0))


def _unpack_plane(bvp: np.ndarray) -> np.ndarray:
    """Packed [N, 128]-word bitvector -> unpacked [N, 4096] int8 plane.

    Bit h lives at word h>>5, bit h&31; viewing the little-endian uint32
    words as bytes puts it at byte h>>3, bit h&7 — exactly numpy's
    little-endian unpackbits order."""
    return np.unpackbits(
        bvp.astype("<u4").view(np.uint8), axis=1,
        bitorder="little").astype(np.int8)


def build_device_sketch_sharded(local_seqs: List[str],
                                global_lens: np.ndarray, start: int,
                                kmer_size: int, both_strands: bool,
                                mesh, n_pad: int) -> DeviceSketch:
    """Per-host shard build (SURVEY §5/§8: each host reads only its slice).

    ``local_seqs`` are this process's contiguous slice of the globally
    length-sorted read list, beginning at global row ``start``; the global
    row count is padded to ``n_pad`` (divisible by the process count and
    the device count).  Tables build NATIVELY on the host over the local
    slice (ops/sketch.build_sketch_tables) and assemble into globally
    row-sharded device arrays — no host ever materializes another host's
    rows.  nk/lens scalars are global (derived from ``global_lens``, which
    every host knows from the streaming metadata scan)."""
    import jax as _jax
    from ..parallel.launch import make_global_sharded
    from .sketch import build_sketch_tables

    n = len(global_lens)
    pc = _jax.process_count()
    assert n_pad % pc == 0, (n_pad, pc)
    rows = n_pad // pc
    assert len(local_seqs) <= rows
    kmax = _round_up(int(max(global_lens)) - kmer_size, 128)
    t = build_sketch_tables(local_seqs, kmer_size, both_strands, kmax=kmax)

    def pad(a, fill=0):
        out = np.full((rows, *a.shape[1:]), fill, dtype=a.dtype)
        out[: a.shape[0]] = a
        return out

    put = lambda a: make_global_sharded(mesh, a)  # noqa: E731
    lens_p = np.zeros(n_pad, np.int32)
    lens_p[:n] = np.asarray(global_lens, np.int32)
    nk_p = np.zeros(n_pad, np.int32)
    nk_p[:n] = lens_p[:n] - kmer_size
    lo, hi = start, start + rows
    sk = DeviceSketch(
        hbp=put(pad(t.hbp, int(PAD))),
        hs=put(pad(t.hs, int(PAD))),
        ps=put(pad(t.ps)),
        plane=put(pad(_unpack_plane(t.bvp))),
        nk=put(nk_p[lo:hi]),
        lens=put(lens_p[lo:hi]),
        bvc=put(pad(t.bvc)),
        nk_host=nk_p, lens_host=lens_p,
        n_real=n, kmer_size=kmer_size)
    if both_strands:
        sk.rev_hs = put(pad(t.rev_hs, int(PAD)))
        sk.rev_ps = put(pad(t.rev_ps))
        sk.rev_plane = put(pad(_unpack_plane(t.rev_bvp)))
    return sk


def build_device_sketch(seqs: List[str], kmer_size: int, both_strands: bool,
                        kmax: Optional[int] = None,
                        n_pad_to: int = 256) -> DeviceSketch:
    """Build all tables on device; one h2d transfer of the code matrix."""
    n = len(seqs)
    lens_host = np.array([len(s) for s in seqs], dtype=np.int32)
    nk_host = (lens_host - kmer_size).astype(np.int32)
    if np.any(nk_host <= 0) or np.any(lens_host <= BV_KMER):
        bad = int(np.argmax(nk_host <= 0))
        raise ValueError(
            f"read {bad} too short (len {lens_host[bad]}) for k={kmer_size}")
    if kmax is None:
        kmax = _round_up(int(nk_host.max()), 128)
    n_pad = _round_up(n, n_pad_to)
    l_pad = kmax + kmer_size

    codes = encode_batch(seqs, l_pad, n_pad)
    nk_p = np.zeros(n_pad, np.int32)
    nk_p[:n] = nk_host
    lens_p = np.zeros(n_pad, np.int32)
    lens_p[:n] = lens_host

    d_codes = jnp.asarray(codes)
    d_nk = jnp.asarray(nk_p)
    d_lens = jnp.asarray(lens_p)
    hbp, hs, ps, plane, bvc = _device_tables(d_codes, d_nk, d_lens,
                                             kmer_size, kmax)
    sk = DeviceSketch(hbp=hbp, hs=hs, ps=ps, plane=plane, nk=d_nk,
                      lens=d_lens, bvc=bvc, nk_host=nk_p, lens_host=lens_p,
                      n_real=n, kmer_size=kmer_size)
    if both_strands:
        rc = _revcomp_codes_batch(d_codes, d_lens)
        _, rhs, rps, rplane, _ = _device_tables(rc, d_nk, d_lens,
                                                kmer_size, kmax)
        sk.rev_hs, sk.rev_ps, sk.rev_plane = rhs, rps, rplane
    sk.bvc_host = np.asarray(bvc)
    return sk
