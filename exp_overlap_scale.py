"""Measure find_overlaps cost vs n (clean, one job on the TPU).

Usage: python exp_overlap_scale.py [n1 n2 ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

from bench import synth_fastq
from pgrc_tpu.core import fastq
from pgrc_tpu.overlap import greedy_scs

sizes = [int(x) for x in sys.argv[1:]] or [250_000, 500_000, 1_000_000, 2_000_000]
L = 100
tmp = "/tmp/pgrc_bench"
os.makedirs(tmp, exist_ok=True)

for n in sizes:
    src = os.path.join(tmp, f"bench_{n}.fastq")
    if not os.path.exists(src):
        synth_fastq(src, n, L, max(n * L // 40, 200_000), seed=7)
    reads = fastq.read_any(src)
    codes = reads.codes
    hq_mask = fastq.quality_high_mask(reads, 0.12, True)
    n_mask = fastq.contains_n_mask(reads)
    hq = codes[np.nonzero(~n_mask & hq_mask)[0]]
    for rep in range(2):
        t0 = time.time()
        res = greedy_scs.find_overlaps(hq, coef=0.65)
        dt = time.time() - t0
        print(f"n={n} hq={hq.shape[0]} rep={rep} stage2={dt:.2f}s "
              f"linked={int((res.succ >= 0).sum())}", flush=True)
