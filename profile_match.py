"""Per-pass profiling of the stage-4 matcher at production settings.

Usage: python profile_match.py [n_reads] [accept_mis]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

from bench import synth_fastq

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
ACCEPT = int(sys.argv[2]) if len(sys.argv) > 2 else 0
L = 100
tmp = "/tmp/pgrc_bench"
os.makedirs(tmp, exist_ok=True)
src = os.path.join(tmp, f"bench_{N}.fastq")
if not os.path.exists(src):
    synth_fastq(src, N, L, max(N * L // 40, 200_000), seed=7)

import jax

from pgrc_tpu.core import fastq, packed
from pgrc_tpu.overlap import greedy_scs
from pgrc_tpu.align import matcher as am
from pgrc_tpu.utils import dna
from pgrc_tpu.config import matching_chars_correction

reads = fastq.read_any(src)
codes = reads.codes
hq_mask = fastq.quality_high_mask(reads, 0.12, True)
n_mask = fastq.contains_n_mask(reads)
n_idx = np.nonzero(n_mask)[0]
lq_idx = np.nonzero(~n_mask & ~hq_mask)[0]
hq_idx = np.nonzero(~n_mask & hq_mask)[0]

res = greedy_scs.find_overlaps(codes[hq_idx], coef=0.65)
keep = greedy_scs.both_sides_overlapped(res)
lq_idx2 = np.concatenate([lq_idx, hq_idx[~keep]])
lq_idx2.sort()
hq_idx2 = hq_idx[keep]
hq_pg, hq_order, hq_pos = greedy_scs.generate_pseudogenome(codes[hq_idx2])
print(f"pg={hq_pg.size} cand={lq_idx2.size + n_idx.size}", flush=True)

cand_idx = np.concatenate([lq_idx2, n_idx])
k = min(32 + matching_chars_correction(len(hq_pg)), L)
cand_codes = codes[cand_idx]
pc = cand_codes.copy()
pc[pc == dna.N] = dna.A

# instrumented copy of match_reads internals
index = am.build_index(hq_pg, k=k, bits=max(14, min(24, (len(hq_pg) // 4).bit_length())))
max_mis = L // 3
cap = 8
k2 = 3

for rep in range(2):
    tag = "warm" if rep == 0 else "meas"
    T = time.time()

    def ck(label):
        global T
        t = time.time()
        print(f"[{tag}] {label:44s} {t - T:8.3f}s", flush=True)
        T = t

    dev = am.device_index(index, hq_pg)
    ck("device_index upload")
    offs_full = am.probe_offsets(L, index.k, k2)
    offs_p1 = am._spread_offsets(offs_full, index.k1)
    cap_p1 = min(cap, 4)
    lanes_f, _ = packed.pack_lanes(pc)
    rc_all = packed.revcomp_codes_matrix(pc)
    rc_all[rc_all > 3] = 0
    lanes_r, _ = packed.pack_lanes(rc_all)
    ck("pack lanes f+r")
    fm, fp = am._probe_batch(lanes_f, offs_p1, index, dev, max_mis, L,
                             batch_rows=131072)
    ck(f"pass1 fwd (offs={len(offs_p1)} cap={cap_p1})")
    rm, rp = am._probe_batch(lanes_r, offs_p1, index, dev, max_mis, L,
                             batch_rows=131072)
    ck("pass1 rc")
    best1 = np.minimum(fm, rm)
    hist = np.bincount(best1.astype(np.int64), minlength=256)
    print(f"   pass1 mis hist: 0={hist[0]} 1={hist[1]} 2={hist[2]} 3={hist[3]} "
          f"4-10={hist[4:11].sum()} 11+={hist[11:255].sum()} miss={hist[255]}")
    rows = np.nonzero(best1 > ACCEPT)[0]
    print(f"   pass2 rows: {rows.size} ({100.0*rows.size/max(len(pc),1):.1f}%)")
    mis_t, pos_t = am._probe_batch(lanes_f[rows], offs_full, index, dev,
                                   max_mis, L, batch_rows=32768, n_verify=6)
    better_f = mis_t < fm[rows]
    fm2, fp2 = fm.copy(), fp.copy()
    fm2[rows] = np.where(better_f, mis_t, fm[rows])
    ck(f"pass2 fwd (offs={len(offs_full)} cap={cap})")
    mis_t, pos_t = am._probe_batch(lanes_r[rows], offs_full, index, dev,
                                   max_mis, L, batch_rows=32768, n_verify=6)
    rm2 = rm.copy()
    rm2[rows] = np.where(mis_t < rm[rows], mis_t, rm[rows])
    ck("pass2 rc")
    n_improved = int((np.minimum(fm2, rm2) < best1)[rows].sum())
    n_exactified = int(((np.minimum(fm2, rm2) == 0) & (best1 > 0))[rows].sum())
    print(f"   pass2 improved {n_improved} rows, found exact for {n_exactified}")
    rows3 = np.nonzero(np.minimum(fm2, rm2) == 255)[0]
    if rows3.size and L >= 32:
        im, ip = am._interleaved_rescue(pc[rows3], hq_pg, min(index.k, 16), max_mis)
        ck(f"rescue fwd ({rows3.size} rows)")
        im, ip = am._interleaved_rescue(rc_all[rows3], hq_pg, min(index.k, 16), max_mis)
        ck("rescue rc")
