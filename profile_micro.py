"""Micro-profiling of find_overlaps segments and match_reads internals."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
src = f"/tmp/pgrc_bench/bench_{N}.fastq"

from pgrc_tpu.core import fastq, packed
from pgrc_tpu.overlap import greedy_scs as g
from pgrc_tpu.align import matcher as am
from pgrc_tpu.utils import dna

reads = fastq.read_any(src)
codes = reads.codes
hq_mask = fastq.quality_high_mask(reads, 0.12, True)
n_mask = fastq.contains_n_mask(reads)
hq_idx = np.nonzero(~n_mask & hq_mask)[0]
sub = codes[hq_idx]

jax, jnp = g._jax()

# ---- instrumented find_overlaps (copy of the loop with timers) ----
def timed_find_overlaps(codes_np, coef):
    n, L = codes_np.shape
    n_pad = g._bucket_size(n)
    if n_pad != n:
        codes_np = np.concatenate([codes_np, np.zeros((n_pad - n, L), dtype=codes_np.dtype)], axis=0)
    t0 = time.time()
    init_fn = g._cached("init", g._build_init_fn, n_pad, L)
    codes_d = jnp.asarray(codes_np)
    codes_d.block_until_ready()
    t_up = time.time() - t0
    t0 = time.time()
    h0, a_s, a_p, succ_g, ovl_g = init_fn(codes_d, jnp.int32(n))
    jax.block_until_ready(succ_g)
    t_init = time.time() - t0
    ids = jnp.arange(n_pad, dtype=jnp.int32)
    h, p = h0, h0
    n_loc = n_pad
    iters = int(L * coef)
    i = 1
    seg_idx = 0
    seg_times = []
    sync_times = 0.0
    compact_times = 0.0
    while i < iters:
        seg = g._SEG_PLAN[seg_idx] if seg_idx < len(g._SEG_PLAN) else g._SEG_TAIL
        seg_idx += 1
        i1 = min(i + seg, iters)
        seg_fn = g._cached("seg", g._build_seg_fn, n_loc, L)
        t0 = time.time()
        h, p, a_s, a_p, succ_g, ovl_g, n_act, n_suf, n_pref = seg_fn(
            codes_d, ids, h, p, a_s, a_p, succ_g, ovl_g, jnp.int32(i), jnp.int32(i1))
        jax.block_until_ready(n_act)
        seg_times.append((n_loc, i1 - i, time.time() - t0))
        i = i1
        if i >= iters:
            break
        t0 = time.time()
        cnt, csuf, cpref = (int(v) for v in jax.device_get((n_act, n_suf, n_pref)))
        sync_times += time.time() - t0
        if csuf == 0 or cpref == 0:
            break
        n_new = max(g._bucket_size(cnt), g._COMPACT_FLOOR)
        if n_new <= n_loc // 2:
            t0 = time.time()
            compact_fn = g._cached("compact", g._build_compact_fn, n_loc, n_new, L)
            codes_d, ids, h, p, a_s, a_p = compact_fn(codes_d, ids, h, p, a_s, a_p)
            jax.block_until_ready(h)
            compact_times += time.time() - t0
            n_loc = n_new
    t0 = time.time()
    succ_h, ovl_h = jax.device_get((succ_g, ovl_g))
    t_down = time.time() - t0
    print(f"  upload {t_up*1000:.0f}ms init {t_init*1000:.0f}ms | segs:", flush=True)
    for nl, rounds, dt in seg_times:
        print(f"    n_loc={nl:7d} rounds={rounds:3d} {dt*1000:7.0f}ms ({dt/rounds*1000:5.1f}ms/round)")
    print(f"  sync {sync_times*1000:.0f}ms compact {compact_times*1000:.0f}ms download {t_down*1000:.0f}ms")
    return g.OverlapResult(succ_h[:n].copy(), ovl_h[:n].copy(), L)


for rep in ("warm", "meas"):
    print(f"[{rep}] stage2-style overlap n={sub.shape[0]}")
    t0 = time.time()
    res = timed_find_overlaps(sub, 0.65)
    print(f"  TOTAL {time.time()-t0:.3f}s")

keep = g.both_sides_overlapped(res)
hq2 = sub[keep]

# host post-processing cost
t0 = time.time()
res2 = timed_find_overlaps(hq2, 1.0)
print(f"stage3 overlap total {time.time()-t0:.3f}s")
t0 = time.time()
g.remove_cycles(res2)
layout = g.layout_chains(res2)
pg = g.assemble_pg(hq2, layout)
print(f"host cycle+layout+assemble {time.time()-t0:.3f}s pg={pg.size}")

# ---- stage 4 internals ----
lq_idx = np.nonzero(~(~n_mask & hq_mask))[0]
cand = np.concatenate([codes[lq_idx], codes[hq_idx[~keep]]])
pc = cand.copy(); pc[pc == dna.N] = dna.A
k = 32
index = am.build_index(pg, k=k, bits=max(14, min(24, (len(pg) // 4).bit_length())))
print(f"cand={pc.shape[0]} index pos={index.positions.size}")

for rep in ("warm", "meas"):
    t0 = time.time()
    rc_codes = packed.revcomp_codes_matrix(pc)
    all_codes = np.concatenate([pc, rc_codes], axis=0)
    all_lanes = packed.widen_lanes_u64(packed.pack_2bit(all_codes))
    t_pack = time.time() - t0

    offs_full = am.probe_offsets(100, k, am.DEFAULT_K2)
    offs_p1 = (offs_full[0], offs_full[len(offs_full) // 2], offs_full[-1])
    t0 = time.time()
    hashes_p1 = am._read_probe_hashes(all_codes, k, offs_p1)
    t_hash = time.time() - t0

    pg_lanes = packed.widen_lanes_u64(packed.pack_text_2bit(pg)[None, :])[0]
    pg_lanes = am._pad_1d(pg_lanes, am._probe_bucket(len(pg_lanes)))
    positions = am._pad_1d(index.positions.astype(np.int32), am._probe_bucket(max(index.positions.size, 1)))
    t0 = time.time()
    dev = (jnp.asarray(index.starts.astype(np.int32)), jnp.asarray(positions),
           jnp.asarray(pg_lanes), len(pg_lanes))
    jax.block_until_ready(dev[2])
    t_up = time.time() - t0

    t0 = time.time()
    mis2, pos2 = am._probe_batch(all_lanes, hashes_p1, offs_p1, 4, index, dev, 33, 100)
    t_p1 = time.time() - t0

    n = pc.shape[0]
    fm, rm = mis2[:n], mis2[n:]
    todo = np.minimum(fm, rm) > 2
    rows = np.nonzero(todo)[0]
    t0 = time.time()
    sel = np.concatenate([rows, rows + n])
    hashes_p2 = am._read_probe_hashes(all_codes[sel], k, offs_full)
    t_hash2 = time.time() - t0
    t0 = time.time()
    mis_t, pos_t = am._probe_batch(all_lanes[sel], hashes_p2, offs_full, 8, index, dev, 33, 100)
    t_p2 = time.time() - t0
    print(f"[{rep}] pack {t_pack:.3f} hash1 {t_hash:.3f} upload {t_up:.3f} "
          f"pass1 {t_p1:.3f} (rows={2*n}) hash2 {t_hash2:.3f} pass2 {t_p2:.3f} (rows={sel.size})")
