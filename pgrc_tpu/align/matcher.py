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


def _build_probe_fn(n_reads: int, L: int, n_probes: int, cap: int, k: int, bits: int,
                    pg_lanes_len: int, max_mis: int):
    """Jitted probe+verify over a read batch (one strand)."""
    jax, jnp = _jax()
    W = packed.num_lanes(L)

    # tail mask for the last read lane
    tail = L - (W - 1) * packed.SYMS_PER_LANE
    lane_mask = np.full(W, 0xFFFFFFFF, dtype=np.uint32)
    lane_mask[W - 1] = (0xFFFFFFFF << (32 - 2 * tail)) & 0xFFFFFFFF if tail < 16 else 0xFFFFFFFF
    lane_mask = lane_mask.astype(np.uint32)

    def probe_fn(read_lanes, probe_hashes, starts, positions, pg_lanes, pg_len):
        # probe_hashes: [R, S] uint32 -> bucket ids
        bid = (probe_hashes >> jnp.uint32(32 - bits)).astype(jnp.int64)
        lo = starts[bid]                    # [R, S]
        cnt = starts[bid + 1] - lo
        cslot = jnp.arange(cap, dtype=jnp.int64)
        cand_idx = lo[:, :, None] + cslot[None, None, :]
        cand_valid = cslot[None, None, :] < cnt[:, :, None]
        cand_idx = jnp.clip(cand_idx, 0, positions.shape[0] - 1)
        text_pos = jnp.take(positions, cand_idx)      # [R, S, C] sampled pg pos
        probe_off = jnp.arange(n_probes, dtype=jnp.int64) * DEFAULT_K2
        start_pos = text_pos - probe_off[None, :, None]
        in_range = (start_pos >= 0) & (start_pos <= pg_len - L) & cand_valid
        start_c = jnp.clip(start_pos, 0, jnp.maximum(pg_len - L, 0))

        # --- packed verify: align pg lanes to read lane grid ---
        q = (start_c >> 4).astype(jnp.int64)          # lane index
        r = (start_c & 15).astype(jnp.uint32)         # symbol offset in lane
        lane_ids = q[..., None] + jnp.arange(W + 1, dtype=jnp.int64)[None, None, None, :]
        lane_ids = jnp.clip(lane_ids, 0, pg_lanes_len - 1)
        tl = jnp.take(pg_lanes, lane_ids)             # [R, S, C, W+1]
        sh = (r * 2)[..., None]
        hi = tl[..., :W] << sh
        lo_part = jnp.where(
            sh > 0, tl[..., 1 : W + 1] >> (jnp.uint32(32) - sh), jnp.uint32(0)
        )
        aligned = (hi | lo_part) & jnp.asarray(lane_mask)[None, None, None, :]
        x = aligned ^ read_lanes[:, None, None, :]
        y = (x | (x >> jnp.uint32(1))) & jnp.uint32(0x55555555)
        mis = packed.popcount_u32(y).sum(axis=-1)     # [R, S, C]
        mis = jnp.where(in_range, mis, 255)
        # deterministic best: (mismatches, position) lexicographic min
        score = mis.astype(jnp.int64) * (jnp.int64(1) << 44) + start_c
        score = jnp.where(in_range, score, jnp.int64(255) << 44)
        best = score.reshape(n_reads, -1).min(axis=1)
        best_mis = (best >> 44).astype(jnp.int32)
        best_pos = (best & ((jnp.int64(1) << 44) - 1)).astype(jnp.int64)
        ok = best_mis <= max_mis
        return jnp.where(ok, best_mis, 255).astype(jnp.uint8), jnp.where(ok, best_pos, -1)

    return jax.jit(probe_fn)


_PROBE_CACHE: dict[tuple, object] = {}


def _read_probe_hashes(codes: np.ndarray, k: int, k2: int) -> np.ndarray:
    """[R, S] uint32 probe hashes at offsets 0, k2, 2*k2, ... per read."""
    n, L = codes.shape
    offs = np.arange(0, L - k + 1, k2, dtype=np.int64)
    pows = _pow_at(np.arange(k - 1, -1, -1))
    # hash per offset: sum codes[:, o+t] * B^(k-1-t)
    out = np.zeros((n, offs.size), dtype=np.uint32)
    for si, o in enumerate(offs):
        out[:, si] = (codes[:, o : o + k].astype(np.uint32) * pows[None, :]).sum(
            axis=1, dtype=np.uint32
        )
    return out


@dataclass
class MatchResult:
    pos: np.ndarray       # [R] int64, -1 = unmatched
    rc: np.ndarray        # [R] bool
    mis: np.ndarray       # [R] uint8 (255 = unmatched)


def match_reads(
    read_codes: np.ndarray,
    index: KmerIndex,
    pg_codes: np.ndarray,
    max_mismatches: int,
    cap: int = DEFAULT_CAP,
    k2: int = DEFAULT_K2,
    batch: int = 65536,
) -> MatchResult:
    """Match every read (both strands) against the indexed pg."""
    jax, jnp = _jax()
    n, L = read_codes.shape
    out_pos = np.full(n, -1, dtype=np.int64)
    out_rc = np.zeros(n, dtype=bool)
    out_mis = np.full(n, 255, dtype=np.uint8)
    if n == 0 or index.positions.size == 0 or index.pg_len < L:
        return MatchResult(out_pos, out_rc, out_mis)

    # bucket pg-dependent array lengths so the compiled probe program is
    # shared across datasets (pg_len itself stays a dynamic argument)
    pg_lanes = packed.pack_text_2bit(pg_codes)
    pg_lanes = _pad_1d(pg_lanes, _probe_bucket(len(pg_lanes)))
    positions = _pad_1d(index.positions, _probe_bucket(max(index.positions.size, 1)))
    pg_lanes_d = jnp.asarray(pg_lanes)
    starts_d = jnp.asarray(index.starts)
    positions_d = jnp.asarray(positions)

    n_probes = len(range(0, L - index.k + 1, k2))
    rc_codes = packed.revcomp_codes_matrix(read_codes)

    for lo in range(0, n, batch):
        hi = min(lo + batch, n)
        bn = hi - lo
        bsz = _probe_bucket(bn)
        key = (bsz, L, n_probes, cap, index.k, index.bits, len(pg_lanes), max_mismatches)
        if key not in _PROBE_CACHE:
            _PROBE_CACHE[key] = _build_probe_fn(
                bsz, L, n_probes, cap, index.k, index.bits, len(pg_lanes), max_mismatches
            )
        probe_fn = _PROBE_CACHE[key]

        fwd = _pad_rows(read_codes[lo:hi], bsz)
        rev = _pad_rows(rc_codes[lo:hi], bsz)
        res = {}
        for strand, codes in (("f", fwd), ("r", rev)):
            lanes = packed.pack_2bit(codes)
            ph = _read_probe_hashes(codes, index.k, k2)
            mis, pos = probe_fn(
                jnp.asarray(lanes), jnp.asarray(ph), starts_d, positions_d,
                pg_lanes_d, index.pg_len,
            )
            mis_h, pos_h = _jax()[0].device_get((mis, pos))
            res[strand] = (mis_h[:bn], pos_h[:bn])
        fm, fp = res["f"]
        rm, rp = res["r"]
        take_r = rm < fm  # strict: forward wins ties (deterministic)
        out_mis[lo:hi] = np.where(take_r, rm, fm)
        out_pos[lo:hi] = np.where(take_r, rp, fp)
        out_rc[lo:hi] = take_r & (rm != 255)
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
