"""Read -> pseudogenome approximate matcher (TPU-native copMEM equivalent).

Replaces CopMEMMatcher + CopMEMReadsApproxMatcher (matching/copmem/
CopMEMMatcher.cpp:139-324 index build, :483-566 probe+verify loop;
matching/ReadsMatchers.cpp:421-451 OMP read loop) with:

  * a CSR sampled k-mer index over the pg (positions every k1, rolling
    polynomial hash -> top `hash_bits` bits bucket id), built vectorized;
  * a statically-shaped probe tensor: every read samples `k2`-strided K-mer
    probes, gathers up to `cap` candidate positions per bucket, and verifies
    all candidates with 2-bit-packed XOR + popcount against the packed pg;
  * both strands probe the SAME index (the RC pass probes RC(read) and flags
    the hit, instead of re-indexing the reverse-complemented pg as the
    reference does, ReadsMatchers.cpp:162-184);
  * a deterministic (mismatches, strand, position) argmin reduction replaces
    the reference's benign OMP race on best-match updates.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core import packed
from ..overlap.greedy_scs import HASH_BASE, HASH_BASE_INV, _jax

DEFAULT_K = 32
DEFAULT_K1 = 4          # pg sampling stride
DEFAULT_K2 = 7          # read probe stride (coprime with k1)
DEFAULT_CAP = 8         # candidates kept per bucket probe
NOT_MATCHED = np.uint8(255)


@dataclass
class KmerIndex:
    starts: np.ndarray      # [2^bits + 1] int32 CSR bucket starts
    positions: np.ndarray   # [P] int32/int64 pg positions (sampled, truncated)
    k: int
    k1: int
    bits: int
    pg_len: int


def _window_hashes(codes: np.ndarray, k: int) -> np.ndarray:
    """Rolling polynomial hash of every k-window of a 1-D code array:
    H(i) = sum codes[i+t] * B^(k-1-t) mod 2^32, computed via prefix sums of
    codes[j] * B^(-j) so the whole array is one vectorized pass."""
    n = codes.shape[0]
    if n < k:
        return np.zeros(0, dtype=np.uint32)
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
    return (s[k : k + nwin] - s[:nwin]) * mult


def _pow_at(exps: np.ndarray) -> np.ndarray:
    """B^exps mod 2^32 for an int array (binary exponentiation, vectorized)."""
    exps = np.asarray(exps, dtype=np.uint64)
    out = np.ones(exps.shape, dtype=np.uint32)
    base = np.uint32(HASH_BASE)
    bit = 0
    maxbits = int(exps.max()).bit_length() if exps.size else 0
    b_pow = base  # B^(2^bit)
    with np.errstate(over="ignore"):
        for bit in range(maxbits):
            mask = ((exps >> np.uint64(bit)) & np.uint64(1)).astype(bool)
            out[mask] = out[mask] * b_pow
            b_pow = b_pow * b_pow
    return out


def build_index(
    pg_codes: np.ndarray,
    k: int = DEFAULT_K,
    k1: int = DEFAULT_K1,
    bits: int = 22,
    max_bucket: int = 24,
) -> KmerIndex:
    """Sampled CSR k-mer index of the pg (host-vectorized build)."""
    n = pg_codes.shape[0]
    if n < k:
        return KmerIndex(
            starts=np.zeros((1 << bits) + 1, dtype=np.int64),
            positions=np.zeros(0, dtype=np.int64),
            k=k, k1=k1, bits=bits, pg_len=n,
        )
    hashes = _window_hashes(pg_codes, k)
    sampled = np.arange(0, n - k + 1, k1, dtype=np.int64)
    hb = (hashes[sampled] >> np.uint32(32 - bits)).astype(np.int64)
    order = np.argsort(hb, kind="stable")
    hb_sorted = hb[order]
    pos_sorted = sampled[order]
    counts = np.bincount(hb_sorted, minlength=1 << bits)
    # truncate oversized buckets (reference collision limits, CopMEMMatcher.h:11-13)
    if counts.max(initial=0) > max_bucket:
        starts_full = np.zeros((1 << bits) + 1, dtype=np.int64)
        np.cumsum(counts, out=starts_full[1:])
        rank_in_bucket = np.arange(hb_sorted.size) - starts_full[hb_sorted]
        keep = rank_in_bucket < max_bucket
        pos_sorted = pos_sorted[keep]
        counts = np.minimum(counts, max_bucket)
    starts = np.zeros((1 << bits) + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    return KmerIndex(starts=starts, positions=pos_sorted, k=k, k1=k1, bits=bits, pg_len=n)


def _build_probe_fn(n_reads: int, L: int, probe_offs: tuple, cap: int, k: int, bits: int,
                    pg_lanes_len: int, max_mis: int):
    """Jitted probe+verify over a read batch.

    uint64 pg lanes (half the gathered elements of the u32 layout — TPU
    gathers cost per element), int32 CSR arrays, static probe-offset tuple
    so progressive passes (few probes first, full fan-out only for the
    stragglers) compile separate lean programs."""
    jax, jnp = _jax()
    W2 = packed.num_lanes64(L)
    n_probes = len(probe_offs)
    probe_off_np = np.asarray(probe_offs, dtype=np.int32)

    # tail mask for the last read lane
    tail = L - (W2 - 1) * packed.SYMS_PER_LANE64
    lane_mask = np.full(W2, 0xFFFFFFFFFFFFFFFF, dtype=np.uint64)
    if tail < packed.SYMS_PER_LANE64:
        lane_mask[W2 - 1] = np.uint64((0xFFFFFFFFFFFFFFFF << (64 - 2 * tail)) & 0xFFFFFFFFFFFFFFFF)

    def probe_fn(read_lanes, probe_hashes, starts, positions, pg_lanes, pg_len):
        # probe_hashes: [R, S] uint32 -> bucket ids
        bid = (probe_hashes >> jnp.uint32(32 - bits)).astype(jnp.int32)
        lo = jnp.take(starts, bid)          # [R, S]
        cnt = jnp.take(starts, bid + 1) - lo
        cslot = jnp.arange(cap, dtype=jnp.int32)
        cand_idx = lo[:, :, None] + cslot[None, None, :]
        cand_valid = cslot[None, None, :] < cnt[:, :, None]
        cand_idx = jnp.clip(cand_idx, 0, positions.shape[0] - 1)
        text_pos = jnp.take(positions, cand_idx)      # [R, S, C] sampled pg pos
        start_pos = text_pos - jnp.asarray(probe_off_np)[None, :, None]
        in_range = (start_pos >= 0) & (start_pos <= pg_len - L) & cand_valid
        start_c = jnp.clip(start_pos, 0, jnp.maximum(pg_len - L, 0))

        # --- packed verify: align pg lanes to read lane grid ---
        q = (start_c >> 5).astype(jnp.int32)          # u64-lane index
        r = (start_c & 31).astype(jnp.uint64)         # symbol offset in lane
        lane_ids = q[..., None] + jnp.arange(W2 + 1, dtype=jnp.int32)[None, None, None, :]
        lane_ids = jnp.clip(lane_ids, 0, pg_lanes_len - 1)
        tl = jnp.take(pg_lanes, lane_ids)             # [R, S, C, W2+1] u64
        sh = (r * jnp.uint64(2))[..., None]
        hi = tl[..., :W2] << sh
        lo_part = jnp.where(
            sh > 0, tl[..., 1 : W2 + 1] >> (jnp.uint64(64) - sh), jnp.uint64(0)
        )
        aligned = (hi | lo_part) & jnp.asarray(lane_mask)[None, None, None, :]
        x = aligned ^ read_lanes[:, None, None, :]
        y = (x | (x >> jnp.uint64(1))) & jnp.uint64(0x5555555555555555)
        mis = packed.popcount_u64(y).sum(axis=-1)     # [R, S, C]
        # deterministic best: (mismatches, position) lexicographic min
        score = mis.astype(jnp.int64) * (jnp.int64(1) << 44) + start_c.astype(jnp.int64)
        score = jnp.where(in_range, score, jnp.int64(255) << 44)
        best = score.reshape(n_reads, -1).min(axis=1)
        best_mis = (best >> 44).astype(jnp.int32)
        best_pos = (best & ((jnp.int64(1) << 44) - 1)).astype(jnp.int64)
        ok = best_mis <= max_mis
        return jnp.where(ok, best_mis, 255).astype(jnp.uint8), jnp.where(ok, best_pos, -1)

    return jax.jit(probe_fn)


_PROBE_CACHE: dict[tuple, object] = {}


def _read_probe_hashes(codes: np.ndarray, k: int, offs: np.ndarray) -> np.ndarray:
    """[R, S] uint32 probe hashes at the given read offsets."""
    n, L = codes.shape
    pows = _pow_at(np.arange(k - 1, -1, -1))
    # hash per offset: sum codes[:, o+t] * B^(k-1-t)
    out = np.zeros((n, len(offs)), dtype=np.uint32)
    for si, o in enumerate(offs):
        out[:, si] = (codes[:, o : o + k].astype(np.uint32) * pows[None, :]).sum(
            axis=1, dtype=np.uint32
        )
    return out


def probe_offsets(L: int, k: int, k2: int) -> tuple:
    return tuple(int(o) for o in range(0, L - k + 1, k2))


@dataclass
class MatchResult:
    pos: np.ndarray       # [R] int64, -1 = unmatched
    rc: np.ndarray        # [R] bool
    mis: np.ndarray       # [R] uint8 (255 = unmatched)


def _probe_batch(rows_lanes64, rows_hashes, offs, cap, index, dev, max_mis, L):
    """Probe a [R,*] row batch (already strand-expanded) in bucketed chunks."""
    jax, jnp = _jax()
    n = rows_lanes64.shape[0]
    out_mis = np.full(n, 255, dtype=np.uint8)
    out_pos = np.full(n, -1, dtype=np.int64)
    starts_d, positions_d, pg_lanes_d, pg_lanes_len = dev
    batch = 131072
    for lo in range(0, n, batch):
        hi = min(lo + batch, n)
        bn = hi - lo
        bsz = _probe_bucket(bn)
        key = (bsz, L, offs, cap, index.k, index.bits, pg_lanes_len, max_mis)
        if key not in _PROBE_CACHE:
            _PROBE_CACHE[key] = _build_probe_fn(
                bsz, L, offs, cap, index.k, index.bits, pg_lanes_len, max_mis
            )
        probe_fn = _PROBE_CACHE[key]
        lanes = _pad_rows(rows_lanes64[lo:hi], bsz)
        ph = _pad_rows(rows_hashes[lo:hi], bsz)
        mis, pos = probe_fn(
            jnp.asarray(lanes), jnp.asarray(ph), starts_d, positions_d,
            pg_lanes_d, index.pg_len,
        )
        mis_h, pos_h = jax.device_get((mis, pos))
        out_mis[lo:hi] = mis_h[:bn]
        out_pos[lo:hi] = pos_h[:bn]
    return out_mis, out_pos


def match_reads(
    read_codes: np.ndarray,
    index: KmerIndex,
    pg_codes: np.ndarray,
    max_mismatches: int,
    cap: int = DEFAULT_CAP,
    k2: int = DEFAULT_K2,
    batch: int = 65536,
    accept_mis: int = 2,
) -> MatchResult:
    """Match every read (both strands) against the indexed pg.

    Progressive two-pass probing (the TPU shape of the reference's per-read
    early exit, CopMEMMatcher.cpp:523-547): pass 1 probes every read (both
    strands in one batch) at 3 spread offsets with a small candidate cap and
    accepts hits with <= accept_mis mismatches; only the leftover rows run
    the full probe fan-out.
    """
    jax, jnp = _jax()
    n, L = read_codes.shape
    out_pos = np.full(n, -1, dtype=np.int64)
    out_rc = np.zeros(n, dtype=bool)
    out_mis = np.full(n, 255, dtype=np.uint8)
    if n == 0 or index.positions.size == 0 or index.pg_len < L:
        return MatchResult(out_pos, out_rc, out_mis)

    # bucket pg-dependent array lengths so the compiled probe program is
    # shared across datasets (pg_len itself stays a dynamic argument)
    pg_lanes = packed.widen_lanes_u64(packed.pack_text_2bit(pg_codes)[None, :])[0]
    pg_lanes = _pad_1d(pg_lanes, _probe_bucket(len(pg_lanes)))
    positions = _pad_1d(index.positions.astype(np.int32), _probe_bucket(max(index.positions.size, 1)))
    dev = (
        jnp.asarray(index.starts.astype(np.int32)),
        jnp.asarray(positions),
        jnp.asarray(pg_lanes),
        len(pg_lanes),
    )

    offs_full = probe_offsets(L, index.k, k2)
    # pass-1 offsets: 3 spread probes (first / middle / last)
    if len(offs_full) > 3:
        offs_p1 = (offs_full[0], offs_full[len(offs_full) // 2], offs_full[-1])
    else:
        offs_p1 = offs_full
    cap_p1 = min(cap, 4)

    # forward-first probing (the TPU shape of the reference's fwd pass then
    # RC-improve-only, ReadsMatchers.cpp:162-184): RC is probed only for
    # reads without a good forward hit, and wins only with strictly fewer
    # mismatches — keeps the rc stream near-all-zero on both-strand pgs.
    lanes_f = packed.widen_lanes_u64(packed.pack_2bit(read_codes))
    hashes_p1 = _read_probe_hashes(read_codes, index.k, offs_p1)
    fm, fp = _probe_batch(
        lanes_f, hashes_p1, offs_p1, cap_p1, index, dev, max_mismatches, L
    )
    rm = np.full(n, 255, dtype=np.uint8)
    rp = np.full(n, -1, dtype=np.int64)

    # pass 2: full fan-out (fwd + rc) for reads not accepted in pass 1
    todo = fm > accept_mis
    rows = np.nonzero(todo)[0]
    if rows.size:
        rc_codes = packed.revcomp_codes_matrix(read_codes[rows])
        sel_codes = np.concatenate([read_codes[rows], rc_codes], axis=0)
        sel_lanes = packed.widen_lanes_u64(packed.pack_2bit(sel_codes))
        hashes_p2 = _read_probe_hashes(sel_codes, index.k, offs_full)
        mis_t, pos_t = _probe_batch(
            sel_lanes, hashes_p2, offs_full, cap, index, dev,
            max_mismatches, L,
        )
        t = rows.size
        better_f = mis_t[:t] < fm[rows]
        fm[rows] = np.where(better_f, mis_t[:t], fm[rows])
        fp[rows] = np.where(better_f, pos_t[:t], fp[rows])
        rm[rows] = mis_t[t:]
        rp[rows] = pos_t[t:]

    take_r = rm < fm  # strict: forward wins ties (deterministic)
    out_mis[:] = np.where(take_r, rm, fm)
    out_pos[:] = np.where(take_r, rp, fp)
    out_rc[:] = take_r & (rm != 255)
    matched = out_mis != 255
    out_pos[~matched] = -1
    return MatchResult(out_pos, out_rc, out_mis)


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
