"""Benchmark: compression throughput + ratio on a synthetic WGS-like FASTQ.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is compression throughput in input Mbases/s on the default (SE,
NORMAL level) configuration. vs_baseline compares against the reference PgRC
binary when one has been built at build-ref/PgRC (see bench_ref.sh);
otherwise against a recorded 8-thread CPU figure from this machine
(BASELINE_LOCAL, measured once and updated when bench_ref runs).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# bases/s of the reference PgRC binary with -t 8 on this machine's CPU;
# refreshed by bench_ref.sh (stored in build-ref/baseline.json when present)
BASELINE_LOCAL_MBASES_S = 2.2


def synth_fastq(path, n_reads, read_len, genome_len, seed=0):
    from pgrc_tpu.utils import dna

    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, size=genome_len, dtype=np.uint8)
    starts = rng.integers(0, genome_len - read_len, size=n_reads)
    codes = genome[starts[:, None] + np.arange(read_len)[None, :]].copy()
    flip = rng.random(n_reads) < 0.5
    codes[flip] = dna.COMPL_VAL[codes[flip][:, ::-1]]
    err = rng.random(codes.shape) < 0.004
    codes[err] = (codes[err] + rng.integers(1, 4, size=int(err.sum()))) % 4
    qual = np.full((n_reads, read_len), ord("I"), dtype=np.uint8)
    lowq = rng.random(n_reads) < 0.12
    qual[lowq, read_len // 2:] = ord("#")
    lines = np.empty((n_reads, read_len * 2 + 7), dtype=np.uint8)
    with open(path, "wb") as f:
        chunk = []
        for i in range(n_reads):
            chunk.append(b"@r%d\n%s\n+\n%s\n" % (
                i, dna.VAL2SYM[codes[i]].tobytes(), qual[i].tobytes()))
            if len(chunk) == 65536:
                f.write(b"".join(chunk))
                chunk = []
        f.write(b"".join(chunk))
    return codes


def read_baseline():
    p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "build-ref", "baseline.json")
    if os.path.exists(p):
        try:
            with open(p) as f:
                return float(json.load(f)["mbases_per_s"])
        except Exception:
            pass
    return BASELINE_LOCAL_MBASES_S


def main():
    n_reads = int(os.environ.get("PGRC_BENCH_READS", 200_000))
    read_len = 100
    genome_len = max(n_reads * read_len // 40, 200_000)  # ~40x coverage
    tmpdir = os.environ.get("PGRC_BENCH_TMP", "/tmp/pgrc_bench")
    os.makedirs(tmpdir, exist_ok=True)
    src = os.path.join(tmpdir, f"bench_{n_reads}.fastq")
    if not os.path.exists(src):
        synth_fastq(src, n_reads, read_len, genome_len, seed=7)

    from pgrc_tpu.archive import encoder, decoder
    from pgrc_tpu.config import PgRCParams

    out = os.path.join(tmpdir, "bench.pgtc")
    # warm-up: full encode of the SAME input so every device program for the
    # measured shapes is compiled (and lands in the persistent cache) before
    # the timed run — jit programs are shape-bucketed, so a smaller warm-up
    # input would compile different programs
    encoder.encode(PgRCParams(src_fastq=src, output=os.path.join(tmpdir, "w.pgtc")))

    t0 = time.time()
    stats = encoder.encode(PgRCParams(src_fastq=src, output=out))
    dt = time.time() - t0
    bases = stats.reads_total * stats.read_len
    mbases_s = bases / 1e6 / dt

    t0 = time.time()
    n_out = decoder.decode_to_files(out, os.path.join(tmpdir, "bench_dec"))
    dec_dt = time.time() - t0

    # correctness gate: the archive must round-trip
    rep = decoder.validate(out, src)
    if rep["errors"] or n_out != stats.reads_total:
        print(json.dumps({"metric": "compression_throughput", "value": 0.0,
                          "unit": "Mbases/s", "vs_baseline": 0.0,
                          "error": "round-trip failed"}))
        return 1

    baseline = read_baseline()
    result = {
        "metric": "compression_throughput",
        "value": round(mbases_s, 3),
        "unit": "Mbases/s",
        "vs_baseline": round(mbases_s / baseline, 3),
        "bits_per_base": round(stats.archive_bytes * 8 / bases, 4),
        "archive_bytes": stats.archive_bytes,
        "reads": stats.reads_total,
        "decomp_mbases_s": round(bases / 1e6 / dec_dt, 3),
        "stage_times_s": {k: round(v, 2) for k, v in stats.stage_times.items()},
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
