"""Multi-chip scoring: shard_map'd seed-vs-pool decision step.

The reference's only parallelism is std::thread fan-out over candidate scans
(cluster.cpp:138-158).  The TPU-native equivalent shards the CANDIDATE axis
over a device mesh: seed sketch tables are replicated, each device gates and
scores its pool shard fully on-device (bitvector popcount gate -> fixed-budget
pair compaction -> join+LIS), and the host assembles the globally-replayed
greedy sweep from the sharded decision matrix.  No collectives are needed in
the steady state — the decision matrix is produced sharded and consumed
shard-by-shard; an all_gather materializes it when a single host drives the
sweep.

This module is also the multi-chip dry-run entry: `dryrun_step` compiles and
executes one full sharded decision step on tiny shapes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.similarity import _expand_matches, _lis_build, _lis_reconstruct, \
    _anchor_filter, _variance


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


class ShardedDecision(NamedTuple):
    decision: jax.Array   # [P, S] int8: 0 no, 1 fwd (2=rev added by caller)
    bases: jax.Array      # [P, S] int32
    var: jax.Array        # [P, S] f32
    needs_host: jax.Array  # [P, S] bool (overflowed budget or m_cap)


def _local_decide(hbp_pool, hs_pool, ps_pool, nk_pool, len_pool, bvp_pool,
                  bvc_pool, hbp_seed, hs_seed, ps_seed, nk_seed, len_seed,
                  bvp_seed, bvc_seed, bv_min_tab, score_min_tab, t_v,
                  *, m_cap: int, budget: int, kmer_size: int, hc_max_dist: int,
                  var_band: float):
    """One shard's seed-vs-pool decisions, fully on device.

    Pool rows are the LOCAL shard; seeds are replicated.  Gated pairs are
    compacted to a fixed ``budget`` and scored; pairs beyond the budget or
    whose match list overflows ``m_cap`` are flagged for host rescoring.
    """
    p = hbp_pool.shape[0]
    s = hbp_seed.shape[0]

    anded = jnp.bitwise_and(bvp_pool[:, None, :], bvp_seed[None, :, :])
    common = jax.lax.population_count(anded).sum(axis=2, dtype=jnp.int32)
    mmax = jnp.maximum(bvc_pool[:, None], bvc_seed[None, :])
    gate = common >= bv_min_tab[mmax]

    flat_gate = gate.reshape(-1)
    pair_idx = jnp.nonzero(flat_gate, size=budget, fill_value=-1)[0]
    valid_pair = pair_idx >= 0
    pi = jnp.clip(pair_idx // s, 0, p - 1)
    si = jnp.clip(pair_idx % s, 0, s - 1)

    hbp_a = hbp_seed[si]
    nk_a = nk_seed[si]
    hs_b = hs_pool[pi]
    ps_b = ps_pool[pi]
    nk_b = nk_pool[pi]

    p1, p2, total = _expand_matches(hbp_a, nk_a, hs_b, ps_b, nk_b, m_cap)
    valid = jax.lax.broadcasted_iota(jnp.int32, p1.shape, 1) < \
        jnp.minimum(total, m_cap)[:, None]
    p_pred, m_idx, l = _lis_build(p2, valid)
    s_arr = _lis_reconstruct(p_pred, m_idx, l)
    a1 = jnp.take_along_axis(p1, s_arr, axis=1)
    a2 = jnp.take_along_axis(p2, s_arr, axis=1)
    bases, hc, kept, dist_arr = _anchor_filter(a1, a2, l, kmer_size, hc_max_dist)
    n_dist = jnp.maximum(kept - 1, 0)
    var = _variance(dist_arr, n_dist)

    mn = jnp.minimum(len_seed[si], len_pool[pi])
    score_ok = bases >= score_min_tab[mn]
    borderline = jnp.abs(var - t_v) <= var_band
    win = score_ok & (var < t_v) & ~borderline & (total <= m_cap) & valid_pair

    decision = jnp.zeros((p * s,), jnp.int8).at[jnp.where(valid_pair, pair_idx, 0)] \
        .max(win.astype(jnp.int8))
    host_flags = (total > m_cap) | (score_ok & borderline)
    needs_host = jnp.zeros((p * s,), jnp.bool_).at[jnp.where(valid_pair, pair_idx, 0)] \
        .max(host_flags & valid_pair)
    # budget overflow: gated pairs that did not get a compaction slot
    n_gated = flat_gate.sum()
    overflowed = n_gated > budget
    needs_host = needs_host | (flat_gate & overflowed)

    bases_mat = jnp.zeros((p * s,), jnp.int32).at[jnp.where(valid_pair, pair_idx, 0)] \
        .max(jnp.where(valid_pair, bases, 0))
    var_mat = jnp.full((p * s,), jnp.inf, jnp.float32).at[jnp.where(valid_pair, pair_idx, 0)] \
        .min(jnp.where(valid_pair, var, jnp.inf))
    return (decision.reshape(p, s), bases_mat.reshape(p, s),
            var_mat.reshape(p, s), needs_host.reshape(p, s))


def build_sharded_decide(mesh: Mesh, *, m_cap: int = 512, budget: int = 256,
                         kmer_size: int = 10, hc_max_dist: int = 10,
                         var_band: float = 0.5):
    """Returns a jitted function computing the full decision matrix with the
    pool axis sharded over ``mesh``'s data axis and seeds replicated."""
    axis = mesh.axis_names[0]
    fn = functools.partial(_local_decide, m_cap=m_cap, budget=budget,
                           kmer_size=kmer_size, hc_max_dist=hc_max_dist,
                           var_band=var_band)
    in_specs = (P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                P(), P(), P(), P(), P(), P(), P(), P(), P(), P())
    out_specs = (P(axis), P(axis), P(axis), P(axis))
    # check_vma=False: the scan carries inside the kernel start as replicated
    # constants and become device-varying, which the vma checker rejects
    try:
        sharded = jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                                out_specs=out_specs, check_vma=False)
    except TypeError:  # older jax spelling
        sharded = jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                                out_specs=out_specs, check_rep=False)
    return jax.jit(sharded)


def dryrun_step(n_devices: int) -> None:
    """Compile + execute one sharded decision step on tiny shapes (driver
    validation hook; see __graft_entry__.dryrun_multichip)."""
    from ..ops import gates
    from ..ops.sketch import build_sketch_tables

    rng = np.random.default_rng(0)
    n = 8 * n_devices
    seqs = ["".join(rng.choice(list("ACGT"), size=int(rng.integers(40, 64))))
            for _ in range(n)]
    t = build_sketch_tables(seqs, 10, False, kmax=128)
    mesh = make_mesh(n_devices)
    decide = build_sharded_decide(mesh, m_cap=64, budget=32, kmer_size=10)

    axis = mesh.axis_names[0]
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    dev = lambda a, s: jax.device_put(jnp.asarray(a), s)  # noqa: E731

    n_seeds = 4
    args_pool = [dev(x, shard) for x in
                 (t.hbp, t.hs, t.ps, t.nk, t.lens, t.bvp, t.bvc)]
    args_seed = [dev(x[:n_seeds], repl) for x in
                 (t.hbp, t.hs, t.ps, t.nk, t.lens, t.bvp, t.bvc)]
    bv_tab = dev(gates.min_numerator_table(4096, 0.4), repl)
    sc_tab = dev(gates.min_numerator_table(int(t.lens.max()), 0.2), repl)
    out = decide(*args_pool, *args_seed, bv_tab, sc_tab, jnp.float32(1e6))
    for o in out:
        np.asarray(o)  # force execution
    assert out[0].shape == (n, n_seeds)
