"""Micro-profiling of find_overlaps segments, match_reads internals, and raw
TPU op throughput (scatter / gather / sort) to ground kernel design choices."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
src = f"/tmp/pgrc_bench/bench_{N}.fastq"
if not os.path.exists(src):
    from bench import synth_fastq

    synth_fastq(src, N, 100, max(N * 100 // 40, 200_000), seed=7)

from pgrc_tpu.core import fastq, packed
from pgrc_tpu.overlap import greedy_scs as g
from pgrc_tpu.align import matcher as am
from pgrc_tpu.utils import dna

jax, jnp = g._jax()


# ---------------------------------------------------------------------------
# raw op micro-benchmarks
# ---------------------------------------------------------------------------
def _time(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def raw_ops():
    rng = np.random.default_rng(0)
    for n in (262144, 2 * 1024 * 1024):
        tb = 8 * n
        idx = jnp.asarray(rng.integers(0, tb, size=n).astype(np.int32))
        vals = jnp.asarray(rng.integers(0, n, size=n).astype(np.int32))
        keys = jnp.asarray(rng.integers(0, 1 << 31, size=n).astype(np.uint32))

        f_scat = jax.jit(lambda i, v: jnp.full((tb,), np.int32(2**30)).at[i].min(v, mode="drop"))
        f_gath = jax.jit(lambda t, i: jnp.take(t, i))
        f_sort = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1, is_stable=True))
        f_sortk = jax.jit(lambda k: jax.lax.sort(k))
        table = jnp.zeros(tb, dtype=jnp.int32)
        print(f"  n={n:8d} tb={tb:9d}: "
              f"scatter-min {_time(f_scat, idx, vals)*1e3:7.2f}ms  "
              f"gather {_time(f_gath, table, idx)*1e3:7.2f}ms  "
              f"kv-sort {_time(f_sort, keys, vals)*1e3:7.2f}ms  "
              f"k-sort {_time(f_sortk, keys)*1e3:7.2f}ms", flush=True)


print("raw ops:", flush=True)
raw_ops()


# ---------------------------------------------------------------------------
# instrumented find_overlaps
# ---------------------------------------------------------------------------
reads = fastq.read_any(src)
codes = reads.codes
hq_mask = fastq.quality_high_mask(reads, 0.12, True)
n_mask = fastq.contains_n_mask(reads)
hq_idx = np.nonzero(~n_mask & hq_mask)[0]
sub = codes[hq_idx]


def timed_find_overlaps(codes_np, coef):
    n, L = codes_np.shape
    n_pad = g._bucket_size(n)
    t0 = time.time()
    lanes_np, nmask_np = packed.pack_lanes(codes_np, n_pad)
    has_n = nmask_np is not None
    t_pack = time.time() - t0
    t0 = time.time()
    init_fn = g._cached("init", g._build_init_fn, n_pad, L, has_n)
    lanes_d = jnp.asarray(lanes_np)
    nmask_d = jnp.asarray(nmask_np) if has_n else jnp.zeros((n_pad, 1), dtype=jnp.uint32)
    lanes_d.block_until_ready()
    t_up = time.time() - t0
    t0 = time.time()
    h0, h0b, a_s, a_p, succ_g, ovl_g = init_fn(lanes_d, nmask_d, jnp.int32(n))
    _ = int(jax.device_get(succ_g[0]))
    t_init = time.time() - t0
    ids = jnp.arange(n_pad, dtype=jnp.int32)
    h, p = h0, h0
    h2, p2 = h0b, h0b
    succ_l = jnp.full((n_pad,), -1, jnp.int32)
    ovl_l = jnp.zeros((n_pad,), jnp.int32)
    n_loc = n_pad
    iters = int(L * coef)
    i = 1
    seg_idx = 0
    seg_times = []
    sync_times = 0.0
    compact_times = 0.0
    counts = []
    while i < iters:
        seg = g._SEG_PLAN[seg_idx] if seg_idx < len(g._SEG_PLAN) else g._SEG_TAIL
        seg_idx += 1
        i1 = min(i + seg, iters)
        seg_fn = g._cached("seg", g._build_seg_fn, n_loc, L, has_n, n_pad, None)
        t0 = time.time()
        (h, p, h2, p2, a_s, a_p, succ_l, ovl_l, succ_g, ovl_g,
         n_act, n_act_max, n_suf, n_pref) = \
            seg_fn(lanes_d, nmask_d, ids, h, p, h2, p2, a_s,
                   a_p, succ_l, ovl_l, succ_g, ovl_g, jnp.int32(i), jnp.int32(i1))
        cnt, csuf, cpref = (int(v) for v in jax.device_get((n_act, n_suf, n_pref)))
        seg_times.append((n_loc, i1 - i, time.time() - t0))
        counts.append((cnt, csuf, cpref))
        i = i1
        if i >= iters or csuf == 0 or cpref == 0:
            break
        n_new = g._ladder_size(cnt)
        if n_new < n_loc:
            t0 = time.time()
            compact_fn = g._cached("compact", g._build_compact_fn, n_loc, n_new, L, has_n, None)
            (lanes_d, nmask_d, ids, h, p, h2, p2, a_s, a_p,
             succ_l, ovl_l) = compact_fn(
                lanes_d, nmask_d, ids, h, p, h2, p2, a_s, a_p, succ_l, ovl_l)
            _ = int(jax.device_get(h[0]))
            compact_times += time.time() - t0
            n_loc = n_new
    t0 = time.time()
    succ_h, ovl_h = jax.device_get((succ_g, ovl_g))
    t_down = time.time() - t0
    print(f"  pack {t_pack*1000:.0f}ms upload {t_up*1000:.0f}ms init {t_init*1000:.0f}ms | segs:", flush=True)
    for (nl, rounds, dt), c in zip(seg_times, counts + [(0, 0, 0)]):
        print(f"    n_loc={nl:7d} rounds={rounds:3d} {dt*1000:7.0f}ms ({dt/rounds*1000:5.1f}ms/round) -> act={c[0]} suf={c[1]} pref={c[2]}")
    print(f"  sync {sync_times*1000:.0f}ms compact {compact_times*1000:.0f}ms download {t_down*1000:.0f}ms")
    return g.OverlapResult(succ_h[:n].copy(), ovl_h[:n].copy(), L)


for rep in ("warm", "meas"):
    print(f"[{rep}] stage2-style overlap n={sub.shape[0]}", flush=True)
    t0 = time.time()
    res = timed_find_overlaps(sub, 0.65)
    print(f"  TOTAL {time.time()-t0:.3f}s", flush=True)

keep = g.both_sides_overlapped(res)
hq2 = sub[keep]

for rep in ("warm", "meas"):
    print(f"[{rep}] stage3 overlap n={hq2.shape[0]}", flush=True)
    t0 = time.time()
    res2 = timed_find_overlaps(hq2, 1.0)
    print(f"  TOTAL {time.time()-t0:.3f}s", flush=True)
t0 = time.time()
from pgrc_tpu import native as _native

fast = _native.chain_walk_assemble(res2.succ, res2.overlap, hq2)
if fast is not None:
    pos_, order_, pg = fast
    print(f"host chainwalk (native) {time.time()-t0:.3f}s pg={pg.size}")
else:
    g.remove_cycles(res2)
    layout = g.layout_chains(res2)
    pg = g.assemble_pg(hq2, layout)
    print(f"host cycle+layout+assemble (numpy) {time.time()-t0:.3f}s pg={pg.size}")

# ---------------------------------------------------------------------------
# stage 4 internals: per-pass timing
# ---------------------------------------------------------------------------
lq_idx = np.nonzero(~(~n_mask & hq_mask))[0]
cand = np.concatenate([codes[lq_idx], codes[hq_idx[~keep]]])
cand[cand == dna.N] = dna.A
k = 32
index = am.build_index(pg, k=k, bits=max(14, min(24, (len(pg) // 4).bit_length())))
print(f"cand={cand.shape[0]} index pos={index.positions.size}")

orig_probe_batch = am._probe_batch
def traced_probe_batch(rows_lanes, offs, index, dev, max_mis, L, batch_rows, mesh=None, wide=False, n_verify=1):
    t0 = time.time()
    out = orig_probe_batch(rows_lanes, offs, index, dev, max_mis, L, batch_rows, mesh=mesh, wide=wide, n_verify=n_verify)
    print(f"    probe rows={rows_lanes.shape[0]:7d} offs={len(offs):3d} nv={n_verify} : {time.time()-t0:.3f}s", flush=True)
    return out
am._probe_batch = traced_probe_batch

for rep in ("warm", "meas"):
    print(f"[{rep}] match_reads:", flush=True)
    t0 = time.time()
    res4 = am.match_reads(cand, index, pg, max_mismatches=33, cap=8)
    um = int((res4.pos < 0).sum())
    print(f"  total {time.time()-t0:.3f}s unmatched={um} rc={int(res4.rc.sum())}", flush=True)
