"""Per-stage / sub-stage profiling of the encoder hot path on real hardware.

Usage: python profile_stages.py [n_reads]
Prints a breakdown: input parse, quality div, stage-2 overlap (per segment),
stage-3 overlap, stage-4 index build / probe passes, stage-5, stage-7 pieces.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

from bench import synth_fastq

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
L = 100
tmp = "/tmp/pgrc_bench"
os.makedirs(tmp, exist_ok=True)
src = os.path.join(tmp, f"bench_{N}.fastq")
if not os.path.exists(src):
    print("generating fastq...", flush=True)
    synth_fastq(src, N, L, max(N * L // 40, 200_000), seed=7)

T0 = time.time()


def ck(label):
    global T0
    t = time.time()
    print(f"{label:40s} {t - T0:8.3f}s", flush=True)
    T0 = t


import jax

print("devices:", jax.devices(), flush=True)
ck("jax init")

from pgrc_tpu.core import fastq, packed
from pgrc_tpu.overlap import greedy_scs
from pgrc_tpu.align import matcher as am
from pgrc_tpu.utils import dna
from pgrc_tpu.config import PgRCParams, matching_chars_correction

reads = fastq.read_any(src)
ck("input parse")
codes = reads.codes

hq_mask = fastq.quality_high_mask(reads, 0.12, True)
n_mask = fastq.contains_n_mask(reads)
n_idx = np.nonzero(n_mask)[0]
lq_idx = np.nonzero(~n_mask & ~hq_mask)[0]
hq_idx = np.nonzero(~n_mask & hq_mask)[0]
ck(f"quality div (hq={hq_idx.size})")

# warm-up pass for stage-2+3 shapes
for rep in range(2):
    tag = "warm" if rep == 0 else "meas"
    t0 = time.time()
    res = greedy_scs.find_overlaps(codes[hq_idx], coef=0.65)
    keep = greedy_scs.both_sides_overlapped(res)
    ck(f"[{tag}] stage2 overlap coef=.65")
    if rep == 0:
        lq_idx2 = np.concatenate([lq_idx, hq_idx[~keep]])
        lq_idx2.sort()
        hq_idx2 = hq_idx[keep]
    t0 = time.time()
    hq_pg, hq_order, hq_pos = greedy_scs.generate_pseudogenome(codes[hq_idx2])
    ck(f"[{tag}] stage3 full pg (n={hq_idx2.size}, pg={hq_pg.size})")

cand_idx = np.concatenate([lq_idx2, n_idx])
k = min(32 + matching_chars_correction(len(hq_pg)), L)
for rep in range(2):
    tag = "warm" if rep == 0 else "meas"
    index = am.build_index(hq_pg, k=k, bits=max(14, min(24, (len(hq_pg) // 4).bit_length())))
    ck(f"[{tag}] stage4 index build (pos={index.positions.size})")
    cand_codes = codes[cand_idx]
    pc = cand_codes.copy()
    pc[pc == dna.N] = dna.A
    mres = am.match_reads(pc, index, hq_pg, max_mismatches=L // 3, cap=8)
    ck(f"[{tag}] stage4 probe ({cand_idx.size} reads, matched={int((mres.pos>=0).sum())})")

lq_un = cand_idx[mres.pos < 0]
for rep in range(2):
    tag = "warm" if rep == 0 else "meas"
    lq_pg, lq_order, lq_pos = greedy_scs.generate_pseudogenome(codes[lq_un])
    ck(f"[{tag}] stage5 lq pg (n={lq_un.size}, pg={lq_pg.size})")

from pgrc_tpu.archive import pg_match
import io

t0 = time.time()
hq_m, lq_m, n_m, streams = pg_match.match_pgs_in_pg(hq_pg, lq_pg, np.zeros(0, np.uint8), 45)
ck(f"stage7 pg-match (hq {hq_pg.size}->{hq_m.size})")

from pgrc_tpu.streams import varlen_dna, codecs

joined = np.concatenate([hq_m, lq_m])
t0 = time.time()
vpacked = varlen_dna.encode(joined.tobytes(), codebook_id=0)
ck(f"stage7 varlen encode ({joined.size} -> {len(vpacked)})")
lz = codecs.lzma_compress(vpacked, codecs.LEVEL_NORMAL, 1)
ck(f"stage7 lzma ({len(vpacked)} -> {len(lz)})")
z = codecs.zstd_compress(vpacked, 19)
ck(f"stage7 zstd19 probe ({len(vpacked)} -> {len(z)})")
