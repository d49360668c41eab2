"""Test whether XLA mega-fusion is what makes the composed round slow:
same step-3 body, with and without optimization_barrier between stages."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from pgrc_tpu.overlap import greedy_scs as g

jax, jnp = g._jax()

N = 262144
N_GLOB = N
TB = 8 * N
SHIFT = np.uint32(32 - (TB.bit_length() - 1))
BIG = np.int32(N_GLOB)
MIXES = (np.uint32(0x9E3779B1), np.uint32(0x85EBCA77),
         np.uint32(0xC2B2AE3D), np.uint32(0x27D4EB2F))
rng = np.random.default_rng(0)
p = jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32))
h = jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32))
ids = jnp.arange(N, dtype=jnp.int32)
a_p = jnp.ones(N, dtype=jnp.bool_)
a_s = jnp.ones(N, dtype=jnp.bool_)


def bench(name, fn, *args, reps=5):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"  {name:52s} {(time.time()-t0)/reps*1e3:7.2f} ms", flush=True)


def step3(h, p, ids, a_p, a_s, barrier):
    def bar(*xs):
        if barrier:
            return jax.lax.optimization_barrier(xs) if len(xs) > 1 else jax.lax.optimization_barrier(xs)[0]
        return xs if len(xs) > 1 else xs[0]

    slots_p = []
    table = jnp.full((TB,), BIG, dtype=jnp.int32)
    for mix in MIXES:
        slot = ((p * mix) >> SHIFT).astype(jnp.int32)
        slots_p.append(slot)
        table = table.at[jnp.where(a_p, slot, TB)].min(ids, mode="drop")
    table = bar(table)
    ptable = jnp.zeros((TB,), dtype=jnp.uint32)
    for slot in slots_p:
        win = a_p & (jnp.take(table, slot) == ids)
        ptable = ptable.at[jnp.where(win, slot, TB)].set(p, mode="drop")
    ptable = bar(ptable)
    cand = jnp.full((N,), BIG, dtype=jnp.int32)
    for mix in MIXES:
        slot_s = ((h * mix) >> SHIFT).astype(jnp.int32)
        cj = jnp.take(table, slot_s)
        pj = jnp.take(ptable, slot_s)
        okj = (cj < BIG) & (cj != ids) & (pj == h)
        cand = jnp.where((cand == BIG) & okj, cj, cand)
    return cand


bench("step3 no barriers", lambda h, p: step3(h, p, ids, a_p, a_s, False), h, p)
bench("step3 with barriers", lambda h, p: step3(h, p, ids, a_p, a_s, True), h, p)


# barrier after EVERY op
def step3_bar_all(h, p):
    def bar(x):
        return jax.lax.optimization_barrier((x,))[0]

    slots_p = []
    table = jnp.full((TB,), BIG, dtype=jnp.int32)
    for mix in MIXES:
        slot = bar(((p * mix) >> SHIFT).astype(jnp.int32))
        slots_p.append(slot)
        table = bar(table.at[jnp.where(a_p, slot, TB)].min(ids, mode="drop"))
    ptable = jnp.zeros((TB,), dtype=jnp.uint32)
    for slot in slots_p:
        win = bar(a_p & (jnp.take(table, slot) == ids))
        ptable = bar(ptable.at[jnp.where(win, slot, TB)].set(p, mode="drop"))
    cand = jnp.full((N,), BIG, dtype=jnp.int32)
    for mix in MIXES:
        slot_s = bar(((h * mix) >> SHIFT).astype(jnp.int32))
        cj = bar(jnp.take(table, slot_s))
        pj = bar(jnp.take(ptable, slot_s))
        okj = (cj < BIG) & (cj != ids) & (pj == h)
        cand = jnp.where((cand == BIG) & okj, cj, cand)
    return cand


bench("step3 barrier-every-op", step3_bar_all, h, p)
