"""10M-read scale proof: cold + warm encode, decode, multiset-fingerprint
round-trip check, RSS. Prints one JSON line.

Usage: python exp_10m.py [n_reads]
"""
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

from bench import synth_fastq

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
L = 100
tmp = "/tmp/pgrc_bench"
src = os.path.join(tmp, f"bench_{N}.fastq")
if not os.path.exists(src):
    synth_fastq(src, N, L, N * L // 40, seed=9)

from pgrc_tpu.archive import decoder, encoder
from pgrc_tpu.config import PgRCParams


out = os.path.join(tmp, "bench_10m.pgtc")
t0 = time.time()
s1 = encoder.encode(PgRCParams(src_fastq=src, output=out))
cold = time.time() - t0
t0 = time.time()
s2 = encoder.encode(PgRCParams(src_fastq=src, output=out))
warm = time.time() - t0
bases = s2.reads_total * L

t0 = time.time()
n_out = decoder.decode_to_files(out, os.path.join(tmp, "bench_10m_dec"))
dec = time.time() - t0
# RSS snapshot BEFORE the verification fingerprint (whose own numpy
# windows would otherwise dominate the peak)
rss_mb = round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1)

# order-independent multiset fingerprint of input DNA lines vs output lines
def np_fingerprint(path, rec_lines, seq_line):
    """Sum over reads of a 64-bit polynomial hash of the read line —
    vectorized: parse all line lengths once per window."""
    B = np.uint64(1099511628211)
    total = np.uint64(0)
    count = 0
    rem = b""
    pows = None
    with open(path, "rb") as f:
        lineno = 0
        while True:
            block = f.read(1 << 25)
            if not block and not rem:
                break
            buf = rem + block if block else rem
            if block:
                cut = buf.rfind(b"\n") + 1
                rem = buf[cut:]
                buf = buf[:cut]
            else:
                rem = b""
                if not buf.endswith(b"\n"):
                    buf += b"\n"
            data = np.frombuffer(buf, dtype=np.uint8)
            ends = np.nonzero(data == 10)[0]
            starts = np.concatenate([[0], ends[:-1] + 1])
            sel = (np.arange(lineno, lineno + ends.size) % rec_lines) == seq_line
            lineno += ends.size
            s, e = starts[sel], ends[sel]
            if s.size == 0:
                continue
            Lw = int((e - s).max())
            if pows is None or pows.size < Lw:
                pows = np.ones(Lw, dtype=np.uint64)
                for i in range(1, Lw):
                    pows[i] = pows[i - 1] * B
            idx = s[:, None] + np.arange(Lw)[None, :]
            idx = np.minimum(idx, data.size - 1)
            mat = data[idx].astype(np.uint64)
            mask = np.arange(Lw)[None, :] < (e - s)[:, None]
            rows = (mat * pows[None, ::1] * mask).sum(axis=1, dtype=np.uint64)
            total += rows.sum(dtype=np.uint64)
            count += s.size
    return int(total), count


fp_in, n_in = np_fingerprint(src, 4, 1)
fp_out, n_out2 = np_fingerprint(os.path.join(tmp, "bench_10m_dec_out"), 1, 0)
ok = (fp_in == fp_out) and (n_in == n_out2 == n_out == N)

print(json.dumps({
    "reads": s2.reads_total,
    "cold_s": round(cold, 1), "cold_mbases_s": round(bases / 1e6 / cold, 2),
    "warm_s": round(warm, 1), "warm_mbases_s": round(bases / 1e6 / warm, 2),
    "bits_per_base": round(s2.archive_bytes * 8 / bases, 4),
    "decode_s": round(dec, 1), "decode_mbases_s": round(bases / 1e6 / dec, 2),
    "roundtrip_fingerprint_ok": ok,
    "stage_times_s": {k: round(v, 2) for k, v in s2.stage_times.items()},
    "peak_rss_mb": rss_mb,
}))
