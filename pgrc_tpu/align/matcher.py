"""Read -> pseudogenome approximate matcher (TPU-native copMEM equivalent).

Replaces CopMEMMatcher + CopMEMReadsApproxMatcher (matching/copmem/
CopMEMMatcher.cpp:139-324 index build, :483-566 probe+verify loop;
matching/ReadsMatchers.cpp:421-451 OMP read loop) with:

  * a SORTED sampled k-mer index over the pg (positions every k1, full
    32-bit rolling polynomial hash), built vectorized on the host;
  * a statically-shaped SORT-MERGE probe program (v2): reads live as
    packed 2-bit u32 lanes; probe anchor hashes are computed ON DEVICE
    from the lanes, then index entries and probe entries are kv-sorted
    together by hash — each probe's candidate (the minimum-position index
    entry with an EXACTLY equal 32-bit hash) comes from a segmented
    cummax carry, and results route back to read-major order with one
    more cheap sort. On this chip a 1M-element random gather costs
    ~11 ms while a 1M-entry multi-operand sort costs ~2 ms, so the
    merge-join replaces every CSR bucket gather of the v1 design;
  * only CONFIRMED candidates are verified (cross-lane-shift XOR +
    popcount against the packed pg), on rows aligned with the read-lane
    matrix so the read side needs no gather at all;
  * forward-first two-phase probing (the reference's fwd pass then
    RC-improve-only, ReadsMatchers.cpp:162-184): pass 1 probes every read
    forward at k1 residue-covering spread offsets and verifies the first
    confirmed anchor; only the leftovers probe both strands at the full
    fan-out with a multi-candidate verify. RC wins only with strictly
    fewer mismatches;
  * a deterministic (mismatches, then position) two-step min reduction
    replaces the reference's benign OMP race on best-match updates.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core import packed
from ..overlap.greedy_scs import HASH_BASE, HASH_BASE_INV, _jax

DEFAULT_K = 32
DEFAULT_K1 = 4          # pg sampling stride
DEFAULT_K2 = 3          # read probe stride (coprime with k1; reference k2 table)
DEFAULT_CAP = 8         # candidates kept per bucket probe
NOT_MATCHED = np.uint8(255)


@dataclass
class KmerIndex:
    hash_sorted: np.ndarray  # [P] uint32 full k-mer hashes (ascending when
    pos_sorted: np.ndarray   # `sorted`); [P] int64 pg position per entry
    k: int
    k1: int
    pg_len: int
    # False = entries unsorted (sampling order). The sort-merge probe does
    # NOT need a sorted index (its min-position carry is order-independent);
    # only host consumers doing searchsorted equal-range lookups
    # (archive/pg_match.py) need sorted=True.
    sorted: bool = True

    @property
    def positions(self) -> np.ndarray:  # back-compat introspection
        return self.pos_sorted


_HASH_BLOCK = 1 << 23


def _window_hashes(codes: np.ndarray, k: int) -> np.ndarray:
    """Rolling polynomial hash of every k-window of a 1-D code array:
    H(i) = sum codes[i+t] * B^(k-1-t) mod 2^32, computed via prefix sums of
    codes[j] * B^(-j). Processed in blocks (k-1 overlap) so the transient
    working set stays ~4x the block size instead of ~16 bytes per pg symbol
    (a 54M-symbol pg cost ~0.9 GB of temporaries, twice concurrently with
    the stage-7 worker thread)."""
    n = codes.shape[0]
    if n < k:
        return np.zeros(0, dtype=np.uint32)
    out = np.empty(n - k + 1, dtype=np.uint32)
    step = _HASH_BLOCK
    for lo in range(0, n - k + 1, step):
        hi = min(lo + step + k - 1, n)
        _window_hashes_block(codes[lo:hi], k, out[lo : hi - k + 1])
    return out


def _window_hashes_block(codes: np.ndarray, k: int, out: np.ndarray) -> None:
    n = codes.shape[0]
    # inv_pows[j] = B^-j; uint32 cumprod wraps mod 2^32, which IS the hash ring
    inv_pows = np.full(n, np.uint32(HASH_BASE_INV), dtype=np.uint32)
    inv_pows[0] = 1
    np.cumprod(inv_pows, out=inv_pows)
    s = np.zeros(n + 1, dtype=np.uint32)
    np.cumsum(codes.astype(np.uint32) * inv_pows, out=s[1:], dtype=np.uint32)
    nwin = n - k + 1
    # H(i) = (S[i+k] - S[i]) * B^(i + k - 1): consecutive powers via cumprod
    mult = np.full(nwin, np.uint32(HASH_BASE), dtype=np.uint32)
    mult[0] = np.uint32(pow(int(HASH_BASE), k - 1, 1 << 32))
    np.cumprod(mult, out=mult)
    np.multiply(s[k : k + nwin] - s[:nwin], mult, out=out)


def build_index(
    pg_codes: np.ndarray,
    k: int = DEFAULT_K,
    k1: int = DEFAULT_K1,
    bits: int | None = None,      # accepted for back-compat; unused (v2)
    max_bucket: int | None = None,
    device_sort: bool = False,
) -> KmerIndex:
    """Sampled sorted k-mer index of the pg (host-vectorized build).

    v2: a plain (hash, position) table sorted by hash — the probe is a
    sort-merge join, so no CSR buckets and no bucket truncation (a
    repetitive pg's long equal-hash runs cost the join nothing; the
    reference's collision limits, CopMEMMatcher.h:11-13, existed to bound
    its per-read bucket scans)."""
    n = pg_codes.shape[0]
    if n < k:
        return KmerIndex(hash_sorted=np.zeros(0, dtype=np.uint32),
                         pos_sorted=np.zeros(0, dtype=np.int64),
                         k=k, k1=k1, pg_len=n)
    hashes = _window_hashes(pg_codes, k)
    sampled = np.arange(0, n - k + 1, k1, dtype=np.int64)
    hs = hashes[sampled]
    if device_sort:
        # the probe join needs no pre-sorted index at all — skip the sort
        return KmerIndex(hash_sorted=hs, pos_sorted=sampled,
                         k=k, k1=k1, pg_len=n, sorted=False)
    order = np.argsort(hs, kind="stable")  # pos ascending within a run
    return KmerIndex(hash_sorted=hs[order], pos_sorted=sampled[order],
                     k=k, k1=k1, pg_len=n)


_POS_BITS = 35          # pos field width in the carry pack (pg <= 2^35)
_POS_MASK = np.uint64((1 << _POS_BITS) - 1)


def _make_probe(n_reads: int, L: int, probe_offs: tuple, k: int, i_pad: int,
                pg_lanes_len: int, max_mis: int, wide: bool = False,
                n_verify: int = 1):
    """Raw (unjitted) sort-merge probe (v2).

    One program: on-device anchor hashes from packed lanes -> kv-sort of
    (index ++ probe) entries by full 32-bit hash -> segmented cummax carry
    gives every probe its minimum-position EXACT-hash candidate -> one
    route sort back to read-major order -> confirmed-only verify on rows
    aligned with the read-lane matrix. No CSR bucket gathers; the only
    gather left is the pg-window fetch of the verify itself.

    `n_verify` = 1 verifies each read's first confirmed offset (pass 1);
    > 1 verifies the first n_verify confirmed offsets and takes the
    deterministic (mismatches, position) minimum (pass 2).

    Per-read independent, so any row partitioning gives identical results —
    the same body runs jitted single-device and shard_mapped over a mesh.
    `wide` switches positions to i64 for pgs past 2^31 symbols (up to 2^35)
    — the TPU analog of the reference's uint_pg_len_max widening
    (pg-config.h:39-44, CopMEMMatcher.cpp:579-590)."""
    jax, jnp = _jax()
    W = (L + 15) // 16
    S = len(probe_offs)
    P = n_reads * S
    m2 = i_pad + P
    if m2 >= (1 << 29):
        raise NotImplementedError("probe batch exceeds 2^29 join entries")
    pos_t = jnp.int64 if wide else jnp.int32
    big_pos = np.int64(0x7FFFFFFFFFFFFFFF) if wide else np.int32(0x7FFFFFFF)
    probe_off_np = np.asarray(probe_offs, dtype=np.int32)
    U32INV = np.uint32(0xFFFFFFFF)

    # constants (numpy, embedded at lowering)
    inv_pows = np.full(L, np.uint32(HASH_BASE_INV), dtype=np.uint32)
    inv_pows[0] = 1
    np.cumprod(inv_pows, out=inv_pows)
    mult = np.zeros(S, dtype=np.uint32)
    for si, o in enumerate(probe_offs):
        mult[si] = np.uint32(pow(int(HASH_BASE), o + k - 1, 1 << 32))
    # tail mask for the last read lane
    lane_mask = np.full(W, 0xFFFFFFFF, dtype=np.uint32)
    tail = L - (W - 1) * packed.SYMS_PER_LANE
    if tail < packed.SYMS_PER_LANE:
        lane_mask[W - 1] = np.uint32((0xFFFFFFFF << (32 - 2 * tail)) & 0xFFFFFFFF)

    def _verify(read_lanes_b, start_c, pg_lanes):
        """Packed mismatch count of pg windows at start_c [...] against
        read lanes broadcast over the same leading dims."""
        q = (start_c >> 4).astype(jnp.int32)
        s2 = ((start_c & 15) << 1).astype(jnp.uint32)
        lane_ids = q[..., None] + jnp.arange(W + 1, dtype=jnp.int32)
        lane_ids = jnp.clip(lane_ids, 0, pg_lanes_len - 1)
        tl = jnp.take(pg_lanes, lane_ids)            # [..., W+1] u32
        s2e = s2[..., None]
        hi = tl[..., :W] << s2e
        lo_part = jnp.where(s2e > 0, tl[..., 1 : W + 1] >> (jnp.uint32(32) - s2e),
                            jnp.uint32(0))
        aligned = (hi | lo_part) & jnp.asarray(lane_mask)
        x = aligned ^ (read_lanes_b & jnp.asarray(lane_mask))
        y = (x | (x >> jnp.uint32(1))) & jnp.uint32(0x55555555)
        return packed.popcount_u32(y).sum(axis=-1)

    def probe_fn(read_lanes, ihash, ipos, pg_lanes, pg_len):
        # --- on-device probe hashes from packed lanes ---
        sh = jnp.arange(15, -1, -1, dtype=jnp.uint32) * jnp.uint32(2)
        v = ((read_lanes[:, :W, None] >> sh[None, None, :]) & jnp.uint32(3)).reshape(
            n_reads, W * 16
        )[:, :L]
        terms = v * jnp.asarray(inv_pows)[None, :]
        s = jnp.concatenate(
            [jnp.zeros((n_reads, 1), jnp.uint32), jnp.cumsum(terms, axis=1, dtype=jnp.uint32)],
            axis=1,
        )
        offs = jnp.asarray(probe_off_np)
        hashes = (jnp.take(s, offs + k, axis=1) - jnp.take(s, offs, axis=1)) * \
            jnp.asarray(mult)[None, :]                      # [R, S]

        # --- sort-merge join: index entries sort before the probes of
        # their equal-hash run; a segmented cummax carry hands each probe
        # the minimum-position index entry of its run ---
        kh = jnp.concatenate([ihash, hashes.reshape(P)])
        key2 = jnp.concatenate([
            jnp.where(ipos >= 0, jnp.uint32(0), U32INV),    # pads -> inert
            jnp.arange(1, P + 1, dtype=jnp.uint32),
        ])
        pay = jnp.concatenate([
            jnp.maximum(ipos, 0).astype(jnp.uint64),
            jnp.zeros((P,), jnp.uint64),
        ])
        khs, k2s, pays = jax.lax.sort((kh, key2, pay), num_keys=2,
                                      is_stable=False)
        idx = jnp.arange(m2, dtype=jnp.int32)
        boundary = jnp.concatenate(
            [jnp.ones(1, jnp.bool_), khs[1:] != khs[:-1]])
        seg_start = jax.lax.cummax(jnp.where(boundary, idx, 0))
        is_index = k2s == 0
        # pack (seg_start, inverted pos): the max carries the latest run's
        # minimum position; a probe confirms iff the carried run is its own
        packv = jnp.where(
            is_index,
            (seg_start.astype(jnp.uint64) << jnp.uint64(_POS_BITS))
            | (jnp.uint64(_POS_MASK) - pays),
            jnp.uint64(0))
        carried = jax.lax.cummax(packv)
        cseg = (carried >> jnp.uint64(_POS_BITS)).astype(jnp.int32)
        cpos = (jnp.uint64(_POS_MASK) - (carried & jnp.uint64(_POS_MASK)))
        confirmed = (carried != 0) & (cseg == seg_start)
        is_probe = (k2s >= 1) & (k2s != U32INV)
        # --- route results back to probe-ordinal order (one cheap sort) ---
        route = jnp.where(is_probe, k2s - jnp.uint32(1), U32INV)
        res = jnp.where(is_probe & confirmed, cpos + jnp.uint64(1),
                        jnp.uint64(0))
        _, res_s = jax.lax.sort((route, res), num_keys=1, is_stable=False)
        res_rs = res_s[:P].reshape(n_reads, S)
        has0 = res_rs > 0
        anchor_pos = (res_rs - jnp.uint64(1)).astype(pos_t)
        start_all = anchor_pos - offs[None, :].astype(pos_t)
        in_range = has0 & (start_all >= 0) & (start_all <= pg_len - L)
        pg_top = jnp.maximum(pg_len - L, 0).astype(pos_t)

        if n_verify == 1:
            # verify the first confirmed offset per read, rows aligned
            pick = jnp.argmax(in_range, axis=1)
            has_r = in_range.any(axis=1)
            st = jnp.take_along_axis(start_all, pick[:, None], axis=1)[:, 0]
            st_c = jnp.clip(st, 0, pg_top)
            mis = _verify(read_lanes[:, :W], st_c, pg_lanes)
            mis = jnp.where(has_r, mis, jnp.int32(255))
            ok = mis <= max_mis
            return (jnp.where(ok, mis, 255).astype(jnp.uint8),
                    jnp.where(ok, st_c, -1).astype(pos_t))

        # verify the first n_verify confirmed offsets per read
        order = jnp.argsort(~in_range, axis=1, stable=True)[:, :n_verify]
        hasv = jnp.take_along_axis(in_range, order, axis=1)
        stv = jnp.take_along_axis(start_all, order, axis=1)
        stv_c = jnp.clip(stv, 0, pg_top)
        mis = _verify(read_lanes[:, None, :W], stv_c, pg_lanes)
        mis = jnp.where(hasv, mis, jnp.int32(255))
        # deterministic best: min mismatches, then min position
        best_mis = mis.min(axis=1)
        pos_cand = jnp.where(mis == best_mis[:, None], stv_c, big_pos)
        best_pos = pos_cand.min(axis=1)
        ok = best_mis <= max_mis
        return (
            jnp.where(ok, best_mis, 255).astype(jnp.uint8),
            jnp.where(ok, best_pos, -1).astype(pos_t),
        )

    return probe_fn


def _build_probe_fn(n_reads: int, L: int, probe_offs: tuple, k: int,
                    i_pad: int, pg_lanes_len: int, max_mis: int, mesh=None,
                    wide: bool = False, n_verify: int = 1):
    """Jitted probe; with `mesh` the read rows are sharded over the "data"
    axis and the sorted index + packed pg stay replicated — each device
    runs its own local merge-join against the full index (the TPU mapping
    of the reference's OMP per-read loop, ReadsMatchers.cpp:426-428).
    Results are identical to the single-device program."""
    jax, _ = _jax()
    if mesh is None:
        return jax.jit(_make_probe(n_reads, L, probe_offs, k, i_pad,
                                   pg_lanes_len, max_mis, wide, n_verify))
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    D = int(np.prod(mesh.devices.shape))
    local = _make_probe(n_reads // D, L, probe_offs, k, i_pad,
                        pg_lanes_len, max_mis, wide, n_verify)

    def local_gathered(*args):
        # replicate the per-shard results so every process of a multi-host
        # mesh can read the full output without a cross-host fetch (the
        # all-gather of [R] u8+pos rows is negligible next to the probe)
        mis, pos = local(*args)
        return (jax.lax.all_gather(mis, "data", tiled=True),
                jax.lax.all_gather(pos, "data", tiled=True))

    smapped = shard_map(
        local_gathered, mesh=mesh,
        in_specs=(P("data"), P(), P(), P(), P()),
        out_specs=(P(), P()),
        # the all_gather makes the outputs replicated by construction; the
        # varying-manner analysis cannot see that through the tiled gather
        check_vma=False,
    )
    return jax.jit(smapped)


_PROBE_CACHE: dict[tuple, object] = {}


def probe_offsets(L: int, k: int, k2: int) -> tuple:
    return tuple(int(o) for o in range(0, L - k + 1, k2))


def _spread_offsets(offs_full: tuple, k1: int) -> tuple:
    """Pass-1 probe offsets: k1 spread offsets whose residues mod k1 cover
    every class. The index samples pg positions every k1, so a read at pg
    position p has its offset-o anchor in the index iff (p+o) % k1 == 0 —
    offsets covering all residues guarantee EVERY error-free read at least
    one indexed exact anchor (without this, 1/k1 of clean reads miss all
    pass-1 anchors and fall through to the full fan-out; measured 78% ->
    ~35% pass-2 leftovers on the 200k bench)."""
    if k1 <= 1 or len(offs_full) <= k1:
        return offs_full
    chosen: list[int] = []
    need = set(range(k1))
    # seed with maximally spread picks, then fill missing residues with the
    # candidate closest to the largest gap
    seeds = [offs_full[round(i * (len(offs_full) - 1) / (k1 - 1))]
             for i in range(k1)]
    for o in seeds:
        if o % k1 in need:
            chosen.append(o)
            need.discard(o % k1)
    for r in sorted(need):
        cands = [o for o in offs_full if o % k1 == r and o not in chosen]
        if not cands:
            continue
        # prefer the candidate farthest from already-chosen offsets
        best = max(cands, key=lambda o: min(abs(o - c) for c in chosen))
        chosen.append(best)
    # residues can stay uncovered when gcd(k2, k1) > 1 (offs_full only hits
    # multiples of k2 mod k1); pad back up to k1 offsets with maximally
    # spread leftovers so pass-1 never probes FEWER windows than the k1
    # budget
    while len(chosen) < k1:
        cands = [o for o in offs_full if o not in chosen]
        if not cands:
            break
        chosen.append(max(cands,
                          key=lambda o: min(abs(o - c) for c in chosen)))
    return tuple(sorted(chosen))


@dataclass
class MatchResult:
    pos: np.ndarray       # [R] int64, -1 = unmatched
    rc: np.ndarray        # [R] bool
    mis: np.ndarray       # [R] uint8 (255 = unmatched)


def _probe_batch(rows_lanes, offs, index, dev, max_mis, L, batch_rows,
                 mesh=None, wide=False, n_verify=1):
    """Probe a [R, W+1] u32 lane batch in bucketed chunks.

    `dev` may carry several index BLOCKS (wide pgs whose sampled index
    exceeds the join's 2^29-entry program limit, the analog of the
    reference's uint_pg_len widening): each batch probes every block and
    results merge by the deterministic (mismatches, position) minimum."""
    jax, jnp = _jax()
    n = rows_lanes.shape[0]
    out_mis = np.full(n, 255, dtype=np.uint8)
    out_pos = np.full(n, -1, dtype=np.int64)
    blocks, pg_lanes_d, pg_lanes_len, i_pad = dev
    D = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
    if D == 1:
        mesh = None
    for lo in range(0, n, batch_rows):
        hi = min(lo + batch_rows, n)
        bn = hi - lo
        bsz = min(max(_probe_bucket(bn), D), batch_rows)
        key = (bsz, L, offs, index.k, i_pad, pg_lanes_len, max_mis,
               D, wide, n_verify)
        if key not in _PROBE_CACHE:
            _PROBE_CACHE[key] = _build_probe_fn(
                bsz, L, offs, index.k, i_pad, pg_lanes_len, max_mis,
                mesh=mesh, wide=wide, n_verify=n_verify,
            )
        probe_fn = _PROBE_CACHE[key]
        lanes = _pad_rows(rows_lanes[lo:hi], bsz)
        # under a mesh, pass host numpy (placed per in_specs on every
        # process); single-device commits to the local chip
        lanes_in = lanes if mesh is not None else jnp.asarray(lanes)
        for ihash_d, ipos_d in blocks:
            mis, pos = probe_fn(
                lanes_in, ihash_d, ipos_d, pg_lanes_d, index.pg_len,
            )
            mis_h, pos_h = jax.device_get((mis, pos))
            mis_b, pos_b = mis_h[:bn], pos_h[:bn].astype(np.int64)
            cur_m, cur_p = out_mis[lo:hi], out_pos[lo:hi]
            better = (mis_b < cur_m) | (
                (mis_b == cur_m) & (pos_b >= 0)
                & ((cur_p < 0) | (pos_b < cur_p)))
            out_mis[lo:hi] = np.where(better, mis_b, cur_m)
            out_pos[lo:hi] = np.where(better, pos_b, cur_p)
    return out_mis, out_pos


# join entries per index block: a wide pg's sampled index (up to 2^33
# entries at 2^35 symbols / k1=4) is probed block by block, each block's
# join staying under the program's 2^29-entry limit
_MAX_INDEX_BLOCK = 1 << 27


def device_index(index: KmerIndex, pg_codes: np.ndarray, wide: bool = False,
                 mesh=None, max_block: int | None = None):
    """Upload the index + packed pg text once per stage.

    The sort-merge probe needs NO pre-sorted index side (its min-position
    carry is order-independent), so index entries upload as-is; oversized
    indexes split into uniform blocks probed separately and merged by
    (mismatches, position) — see _probe_batch.

    Under a mesh the arrays stay host-side numpy: the jitted shard_map
    places them per its replicated in_specs on every call, which works
    identically on a single process and on a multi-host (jax.distributed)
    mesh where each process holds the same host value."""
    jax, jnp = _jax()
    pg_lanes = packed.pack_text_2bit(pg_codes)
    pg_lanes = _pad_1d(np.concatenate([pg_lanes, np.zeros(1, np.uint32)]),
                       _probe_bucket(len(pg_lanes) + 1))
    max_block = max_block or _MAX_INDEX_BLOCK
    n_ent = index.pos_sorted.size
    n_blocks = max(1, -(-n_ent // max_block))
    per = -(-max(n_ent, 1) // n_blocks)
    i_pad = _probe_bucket(per)
    conv = (lambda a: a) if mesh is not None else jnp.asarray
    blocks = []
    pos_dt = np.int64 if wide else np.int32
    for b in range(n_blocks):
        lo, hi = b * per, min((b + 1) * per, n_ent)
        ihash = _pad_1d(index.hash_sorted[lo:hi], i_pad)
        # pad positions with -1: the probe treats negative-pos entries as inert
        ipos = np.full(i_pad, -1, dtype=pos_dt)
        ipos[: hi - lo] = index.pos_sorted[lo:hi]
        blocks.append((conv(ihash), conv(ipos)))
    return (blocks, conv(pg_lanes), len(pg_lanes), i_pad)


def match_reads(
    read_codes: np.ndarray,
    index: KmerIndex,
    pg_codes: np.ndarray,
    max_mismatches: int,
    cap: int = DEFAULT_CAP,
    k2: int = DEFAULT_K2,
    batch: int = 65536,
    accept_mis: int = 2,
    mesh=None,
    force_wide: bool = False,
    index_block: int | None = None,
) -> MatchResult:
    """Match every read against the indexed pg, forward-first.

    N symbols in reads probe as A (2-bit packing collapses them); the
    encoder re-verifies N rows exactly (encoder.py stage 4).

    pgs past 2^31 symbols automatically switch to the wide (i64 position)
    probe variant; `force_wide` exercises it on small inputs (tests).
    """
    jax, jnp = _jax()
    n, L = read_codes.shape
    out_pos = np.full(n, -1, dtype=np.int64)
    out_rc = np.zeros(n, dtype=bool)
    out_mis = np.full(n, 255, dtype=np.uint8)
    if n == 0 or index.positions.size == 0 or index.pg_len < L:
        return MatchResult(out_pos, out_rc, out_mis)
    wide = force_wide or index.pg_len > 0x7FFF0000 - L
    if index.pg_len > (1 << 35):
        raise NotImplementedError(
            "pg longer than 2^35 symbols exceeds i32 lane indexing"
        )

    dev = device_index(index, pg_codes, wide=wide, mesh=mesh,
                       max_block=index_block)
    offs_full = probe_offsets(L, index.k, k2)
    offs_p1 = _spread_offsets(offs_full, index.k1)
    # batch rows scale with the index so the join's index side amortizes:
    # every batch re-sorts the i_pad index entries, so probes per batch
    # must stay within ~1x of them (at a 54M-symbol pg the old fixed 32k
    # batches re-sorted a 16.7M-entry index 74 times — over half the 10M-
    # read encode). Batch sizes are floored to a power of two (and i_pad
    # is one already), so a full batch never mints a non-pow2 compiled
    # shape and always divides evenly across mesh devices.
    i_pad = dev[3]
    b1 = min(1 << 22, max(131072, _pow2_floor(i_pad // max(len(offs_p1), 1))))
    b2 = min(1 << 19, max(32768, _pow2_floor(i_pad // max(len(offs_full), 1))))

    # pass 1: BOTH strands at k1 residue-covering spread offsets for every
    # read, verifying the first confirmed anchor (on a strand-mixed input
    # ~half the reads only match reverse-complemented; probing rc up front
    # keeps them out of the expensive full fan-out — the reference instead
    # rc-flips the whole pg and re-runs matching, ReadsMatchers.cpp:162-184)
    lanes_f, _ = packed.pack_lanes(read_codes)
    rc_all = packed.revcomp_codes_matrix(read_codes)
    rc_all[rc_all > 3] = 0  # N probes as A on the RC strand too
    lanes_r, _ = packed.pack_lanes(rc_all)
    # both strands go through ONE probe dispatch as [fwd; rc] row blocks:
    # on the tunneled device, per-call latency rivals the compute, so
    # halving the dispatch count nearly halves small-batch pass time
    lanes_fr = np.concatenate([lanes_f, lanes_r])
    bm, bp = _probe_batch(lanes_fr, offs_p1, index, dev, max_mismatches,
                          L, batch_rows=b1, mesh=mesh, wide=wide)
    fm, rm = bm[:n].copy(), bm[n:].copy()
    fp, rp = bp[:n].copy(), bp[n:].copy()

    # pass 2: full fan-out on both strands only for unaccepted leftovers,
    # best of the first `cap` confirmed anchors per read
    n_verify2 = max(2, min(cap, 6))
    rows = np.nonzero(np.minimum(fm, rm) > accept_mis)[0]
    if rows.size:
        sub = np.concatenate([lanes_f[rows], lanes_r[rows]])
        mis_t, pos_t = _probe_batch(sub, offs_full, index, dev,
                                    max_mismatches, L, batch_rows=b2,
                                    mesh=mesh, wide=wide, n_verify=n_verify2)
        k = rows.size
        better_f = mis_t[:k] < fm[rows]
        fm[rows] = np.where(better_f, mis_t[:k], fm[rows])
        fp[rows] = np.where(better_f, pos_t[:k], fp[rows])
        better_r = mis_t[k:] < rm[rows]
        rm[rows] = np.where(better_r, mis_t[k:], rm[rows])
        rp[rows] = np.where(better_r, pos_t[k:], rp[rows])

    # pass 3: interleaved-anchor rescue for reads both device passes missed
    # (burst errors can kill every contiguous k-mer anchor; an interleaved
    # anchor samples every 2nd symbol over a 2k window and survives them).
    # The pg-side interleaved index is built once and shared by both strands
    rows = np.nonzero(np.minimum(fm, rm) == 255)[0]
    k_resc = min(index.k, 16)
    if rows.size and L >= 2 * k_resc and pg_codes.size >= 2 * k_resc:
        ridx = _build_rescue_index(pg_codes, k_resc)
        im, ip = _interleaved_rescue(read_codes[rows], pg_codes, k_resc,
                                     max_mismatches, ridx=ridx)
        better = im < fm[rows]
        fm[rows] = np.where(better, im, fm[rows])
        fp[rows] = np.where(better, ip, fp[rows])
        rc_sub = rc_all[rows]
        im, ip = _interleaved_rescue(rc_sub, pg_codes, k_resc,
                                     max_mismatches, ridx=ridx)
        better = im < rm[rows]
        rm[rows] = np.where(better, im, rm[rows])
        rp[rows] = np.where(better, ip, rp[rows])

    take_r = rm < fm  # strict: forward wins ties (deterministic)
    out_mis[:] = np.where(take_r, rm, fm)
    out_pos[:] = np.where(take_r, rp, fp)
    out_rc[:] = take_r & (rm != 255)
    matched = out_mis != 255
    out_pos[~matched] = -1
    return MatchResult(out_pos, out_rc, out_mis)


def _build_rescue_index(pg_codes: np.ndarray, k: int, k1: int = 2,
                        bits: int = 20):
    """Interleaved-anchor CSR index of the pg: hash of every 2nd symbol
    over a 2k window at positions sampled every k1. Built once per stage
    and shared by the forward and rc rescue calls.

    Interleaved window hash at pg position p = contiguous window hash of
    the parity-(p%2) downsampled sequence at index p//2."""
    span = 2 * k
    half = [_window_hashes(pg_codes[0::2], k), _window_hashes(pg_codes[1::2], k)]
    sampled = np.arange(0, pg_codes.size - span + 1, k1, dtype=np.int64)
    hs = np.where(sampled % 2 == 0,
                  half[0][np.clip(sampled // 2, 0, half[0].size - 1)],
                  half[1][np.clip(sampled // 2, 0, max(half[1].size - 1, 0))])
    hb = (hs >> np.uint32(32 - bits)).astype(np.int64)
    order = np.argsort(hb, kind="stable")
    counts = np.bincount(hb[order], minlength=1 << bits)
    starts = np.zeros((1 << bits) + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    return sampled[order], hs[order], starts, bits


def _interleaved_rescue(read_codes: np.ndarray, pg_codes: np.ndarray,
                        k: int, max_mis: int, k1: int = 2, k2: int = 1,
                        bits: int = 20, cap: int = 4, ridx=None):
    """Interleaved-pattern anchor matching for leftover reads (the
    InterleavedReadsApproxMatcher role, matching/ReadsMatchers.cpp:343-409):
    anchors hash every SECOND symbol of a 2k-wide window, so a burst of
    errors inside one contiguous k-mer cannot kill every anchor. Host
    numpy — this only ever runs on the few reads both device passes missed.

    Returns (mis uint8 [R], pos int64 [R]) in forward orientation.
    """
    n, L = read_codes.shape
    out_mis = np.full(n, 255, dtype=np.uint8)
    out_pos = np.full(n, -1, dtype=np.int64)
    span = 2 * k  # window width covered by one interleaved anchor
    if n == 0 or pg_codes.size < span or L < span:
        return out_mis, out_pos
    if ridx is None:
        ridx = _build_rescue_index(pg_codes, k, k1, bits)
    pos_s, h_s, starts, bits = ridx

    r_half0 = np.stack([_window_hashes(read_codes[r, 0::2], k)
                        for r in range(n)])
    r_half1 = np.stack([_window_hashes(read_codes[r, 1::2], k)
                        for r in range(n)])
    offs = np.arange(0, L - span + 1, k2, dtype=np.int64)
    for o in offs:
        rh = r_half0[:, o // 2] if o % 2 == 0 else r_half1[:, o // 2]
        b = (rh >> np.uint32(32 - bits)).astype(np.int64)
        lo = starts[b]
        cnt = np.minimum(starts[b + 1] - lo, cap)
        for c in range(cap):
            rows = np.nonzero(c < cnt)[0]
            if rows.size == 0:
                break
            j = lo[rows] + c
            okh = h_s[j] == rh[rows]
            # anchor parity must match the read offset parity relative to
            # the aligned start (start = anchor_pos - o)
            start = pos_s[j] - o
            valid = okh & (start >= 0) & (start <= pg_codes.size - L)
            rr = rows[valid]
            if rr.size == 0:
                continue
            st = start[valid]
            win = pg_codes[st[:, None] + np.arange(L)[None, :]]
            mis = (win != read_codes[rr]).sum(axis=1)
            better = (mis <= max_mis) & (
                (mis < out_mis[rr])
                | ((mis == out_mis[rr]) & (st < out_pos[rr]))
            )
            out_mis[rr[better]] = mis[better].astype(np.uint8)
            out_pos[rr[better]] = st[better]
    return out_mis, out_pos


def _pow2_floor(x: int) -> int:
    return 1 << (max(int(x), 1).bit_length() - 1)


def _probe_bucket(n: int) -> int:
    b = 1024
    while b < n:
        b *= 2
    return b


def _pad_rows(mat: np.ndarray, n: int) -> np.ndarray:
    if mat.shape[0] == n:
        return mat
    pad = np.zeros((n - mat.shape[0], mat.shape[1]), dtype=mat.dtype)
    return np.concatenate([mat, pad], axis=0)


def _pad_1d(arr: np.ndarray, n: int) -> np.ndarray:
    """Zero-pad a 1-D array to length n (padding is only ever gathered under
    a mask, so the values are inert)."""
    if arr.shape[0] >= n:
        return arr
    return np.concatenate([arr, np.zeros(n - arr.shape[0], dtype=arr.dtype)])
