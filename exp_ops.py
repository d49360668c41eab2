"""Pin down which gather/scatter composition is slow on this TPU."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from pgrc_tpu.overlap import greedy_scs as g

jax, jnp = g._jax()

N = 262144
TB = 8 * N
SHIFT = np.uint32(32 - (TB.bit_length() - 1))
rng = np.random.default_rng(0)
p = jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32))
ids = jnp.arange(N, dtype=jnp.int32)
idx_pre = jnp.asarray(rng.integers(0, TB, size=N).astype(np.int32))
table0 = jnp.asarray(rng.integers(0, N, size=TB).astype(np.int32))
MIX = np.uint32(0x9E3779B1)


def bench(name, fn, *args, reps=10):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"  {name:52s} {(time.time()-t0)/reps*1e3:7.2f} ms", flush=True)


print(f"n={N} tb={TB}")
bench("gather pre idx", lambda t, i: jnp.take(t, i), table0, idx_pre)
bench("gather computed idx", lambda t, p: jnp.take(t, ((p * MIX) >> SHIFT).astype(jnp.int32)), table0, p)
bench("gather mode=clip", lambda t, i: jnp.take(t, i, mode="clip"), table0, idx_pre)
bench("gather mode=fill", lambda t, i: jnp.take(t, i, mode="fill"), table0, idx_pre)
bench("gather lax.gather-via-[] idx", lambda t, i: t[i], table0, idx_pre)

def g2dep(t, i):
    a = jnp.take(t, i)
    b = jnp.take(t, jnp.clip(a, 0, TB - 1))
    return b
bench("2 dependent gathers", g2dep, table0, idx_pre)

def g4indep(t, p):
    acc = jnp.int32(0)
    for mix in (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F):
        acc = acc + jnp.take(t, ((p * np.uint32(mix)) >> SHIFT).astype(jnp.int32))
    return acc
bench("4 independent gathers (computed idx)", g4indep, table0, p)

bench("scatter-min fresh pre idx",
      lambda i, v: jnp.full((TB,), np.int32(2**30)).at[i].min(v, mode="drop"), idx_pre, ids)
bench("scatter-min fresh computed idx",
      lambda p, v: jnp.full((TB,), np.int32(2**30)).at[((p * MIX) >> SHIFT).astype(jnp.int32)].min(v, mode="drop"), p, ids)

def s4chain(p, v):
    t = jnp.full((TB,), np.int32(2**30))
    for mix in (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F):
        t = t.at[((p * np.uint32(mix)) >> SHIFT).astype(jnp.int32)].min(v, mode="drop")
    return t
bench("4 chained scatter-mins", s4chain, p, ids)

def s1_g1(p, v):
    t = jnp.full((TB,), np.int32(2**30)).at[((p * MIX) >> SHIFT).astype(jnp.int32)].min(v, mode="drop")
    return jnp.take(t, ((p * np.uint32(0x85EBCA77)) >> SHIFT).astype(jnp.int32))
bench("scatter-min then gather (dependent)", s1_g1, p, ids)

# masked scatter like production: jnp.where(active, slot, TB) with mode=drop
act = jnp.ones(N, dtype=jnp.bool_)
def s_masked(p, v, act):
    slot = ((p * MIX) >> SHIFT).astype(jnp.int32)
    return jnp.full((TB,), np.int32(2**30)).at[jnp.where(act, slot, TB)].min(v, mode="drop")
bench("scatter-min masked (where->TB, drop)", s_masked, p, ids, act)

# scatter .set (like ptable)
def s_set(p, v, act):
    slot = ((p * MIX) >> SHIFT).astype(jnp.int32)
    return jnp.zeros((TB,), jnp.uint32).at[jnp.where(act, slot, TB)].set(p, mode="drop")
bench("scatter-set masked", s_set, p, ids, act)

# gather from 1-element-padded p array by candidate id (ptable replacement)
pg = jnp.concatenate([p, jnp.zeros(1, jnp.uint32)])
cand = jnp.asarray(rng.integers(0, N, size=N).astype(np.int32))
bench("gather p[cand] (n-sized table)", lambda pg, c: jnp.take(pg, c), pg, cand)

# sort-based alternative: one kv sort of 2n keys (hash,side) + payload
keys2 = jnp.asarray(rng.integers(0, 1 << 32, size=2 * N, dtype=np.uint64).astype(np.uint32))
pay2 = jnp.arange(2 * N, dtype=jnp.int32)
bench("kv-sort 2n (u32 key, i32 payload)", lambda k, v: jax.lax.sort((k, v), num_keys=1, is_stable=True), keys2, pay2)
bench("kv-sort 2n 2 payloads", lambda k, v: jax.lax.sort((k, v, v), num_keys=1, is_stable=True), keys2, pay2)
