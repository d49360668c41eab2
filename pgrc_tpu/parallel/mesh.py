"""Multi-chip sharding of the compression pipeline.

The reference's entire parallelism surface is OpenMP loops + parallel sorts
(SURVEY.md §2.8). The TPU-native equivalent: read batches are data-parallel
over a 1-D device mesh ("data" axis), the pseudogenome + k-mer index are
replicated (they fit HBM for 100M-read inputs; shard-by-hash-range is the
escape hatch), per-read match records stay sharded, and scalar statistics
(matched counts, mismatch histograms — the OMP `reduction` clauses of
matching/ReadsMatchers.cpp:426-428) merge with psum over ICI.
"""
from __future__ import annotations

from functools import partial

import numpy as np


def make_mesh(n_devices: int | None = None):
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("data",))


def sharded_match_step(mesh, read_len: int, k: int, bits: int, cap: int,
                       probe_offs: tuple, max_mis: int):
    """Build a pjit-ed, shard_map-ed device step: packed reads (sharded) vs
    replicated pg index -> per-read best match + psum'd match histogram.

    Returns fn(read_codes [N,L] u8, starts, positions, pg_lanes [P] u32,
    pg_len [1] i32) -> (mis [N] u8, pos [N] i32, hist [256] i32 replicated).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from ..align import matcher as am
    from ..core import packed

    def local_step(codes, starts, positions, pg_lanes, pg_len):
        n_local = codes.shape[0]
        probe = am._build_probe_fn(
            n_local, read_len, probe_offs, cap, k, bits, pg_lanes.shape[0], max_mis
        )
        lanes = jnp.concatenate(
            [packed.pack_2bit(codes), jnp.zeros((n_local, 1), jnp.uint32)], axis=1
        )
        mis, pos = probe(lanes, starts, positions, pg_lanes, pg_len[0])
        hist = jnp.zeros(256, dtype=jnp.int32).at[mis.astype(jnp.int32)].add(
            1, mode="drop"
        )
        hist = jax.lax.psum(hist, "data")
        return mis, pos, hist

    smapped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P("data"), P(), P(), P(), P()),
        out_specs=(P("data"), P("data"), P()),
    )
    return jax.jit(smapped)


def sharded_overlap_round(mesh, n: int, read_len: int):
    """A data-parallel slice of one overlap round: per-shard rolling-hash
    updates (embarrassingly parallel) + all-gather of the active suffix/prefix
    hash tables for the global sort+match (run replicated here; a future
    version keys the sort by hash range per device)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from ..overlap import greedy_scs as g

    # numpy constants only — closed-over device arrays stall lowering (see
    # greedy_scs._build_sweep_fn)
    pows = g._pow_table(read_len)
    inv = np.uint32(g.HASH_BASE_INV)

    def local_update(i, codes, h, p):
        L = read_len
        ci = jax.lax.dynamic_slice_in_dim(codes, i[0] - 1, 1, axis=1)[:, 0].astype(jnp.uint32)
        h = h - ci * jnp.asarray(pows)[L - i[0]]
        cm = jax.lax.dynamic_slice_in_dim(codes, L - i[0], 1, axis=1)[:, 0].astype(jnp.uint32)
        p = (p - cm) * inv
        # gather the global tables for the (replicated) sort+match stage
        h_all = jax.lax.all_gather(h, "data", tiled=True)
        p_all = jax.lax.all_gather(p, "data", tiled=True)
        return h, p, h_all, p_all

    smapped = shard_map(
        local_update,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data")),
        out_specs=(P("data"), P("data"), P(), P()),
        # h_all/p_all are tiled all_gather results — identical on every
        # device, but the VMA checker can't infer that statically
        check_vma=False,
    )
    return jax.jit(smapped)
