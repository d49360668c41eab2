"""Ablate the overlap round and matcher probe to find the 10-20x overhead
between raw op cost and composed-program cost on the TPU."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from pgrc_tpu.overlap import greedy_scs as g
from pgrc_tpu.core import packed

jax, jnp = g._jax()

def _suffix_eq_prefix_exact(jax, jnp, lanes, nmask, lanes_full, nmask_full,
                            pr_id, i, L, has_n):
    """Exact packed suffix-vs-prefix compare (the pre-v1.4 per-round verify,
    kept here for the archived experiment)."""
    W = (L + 15) // 16
    q = i // 16
    s2 = ((i % 16) * 2).astype(jnp.uint32)
    lane_idx = jnp.clip(q + jnp.arange(W + 1, dtype=jnp.int32), 0, W)
    a = jnp.take(lanes, lane_idx, axis=1)
    hi = a[:, :W] << s2
    lo = jnp.where(s2 > 0, a[:, 1 : W + 1] >> (jnp.uint32(32) - s2), jnp.uint32(0))
    suf = hi | lo
    rb = jnp.take(lanes_full[:, :W], pr_id, axis=0)
    rem = (jnp.int32(L) - i).astype(jnp.int32)
    kvec = jnp.clip(rem - 16 * jnp.arange(W, dtype=jnp.int32), 0, 16)
    shift = jnp.clip(32 - 2 * kvec, 0, 31).astype(jnp.uint32)
    mask = jnp.where(kvec > 0, jnp.uint32(0xFFFFFFFF) << shift, jnp.uint32(0))
    return (((suf ^ rb) & mask[None, :]) == 0).all(axis=1)


N_GLOB = 262144
N = 262144
L = 100
TB = 8 * N_GLOB
SHIFT = np.uint32(32 - (TB.bit_length() - 1))
BIG = np.int32(N_GLOB)
MIXES = (np.uint32(0x9E3779B1), np.uint32(0x85EBCA77),
         np.uint32(0xC2B2AE3D), np.uint32(0x27D4EB2F))
W = (L + 15) // 16

rng = np.random.default_rng(0)
codes = rng.integers(0, 4, size=(N, L)).astype(np.uint8)
lanes_np, _ = packed.pack_lanes(codes, N)
lanes = jnp.asarray(lanes_np)
ids = jnp.arange(N, dtype=jnp.int32)
h = jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32))
p = jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32))
a_s = jnp.ones(N, dtype=jnp.bool_)
a_p = jnp.ones(N, dtype=jnp.bool_)
succ_g = jnp.full(N_GLOB, -1, jnp.int32)
ovl_g = jnp.zeros(N_GLOB, jnp.int32)
pows = g._pow_table(L)
inv = np.uint32(g.HASH_BASE_INV)


def bench(name, fn, args, rounds=8, reps=3):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps / rounds * 1000
    print(f"  {name:44s} {dt:7.2f} ms/round", flush=True)


ROUNDS = 8


def loop(body):
    def fn(lanes, ids, h, p, a_s, a_p, succ_g, ovl_g):
        def b(i, carry):
            return body(jnp.int32(i), lanes, ids, *carry)
        return jax.lax.fori_loop(1, 1 + ROUNDS, b, (h, p, a_s, a_p, succ_g, ovl_g))
    return fn


def hash_upd(i, h, p):
    vi = (jax.lax.dynamic_slice_in_dim(lanes, (i - 1) // 16, 1, axis=1)[:, 0]
          >> jnp.uint32(2)) & jnp.uint32(3)
    h = h - vi * jnp.asarray(pows)[L - i]
    p = (p - vi) * inv
    return h, p


# 1. hash updates only
def r_hash(i, lanes, ids, h, p, a_s, a_p, sg, og):
    h, p = hash_upd(i, h, p)
    return h, p, a_s, a_p, sg, og


# 2. + table scatter (4 probes, id table only)
def r_table(i, lanes, ids, h, p, a_s, a_p, sg, og):
    h, p = hash_upd(i, h, p)
    table = jnp.full((TB,), BIG, dtype=jnp.int32)
    for mix in MIXES:
        slot = ((p * mix) >> SHIFT).astype(jnp.int32)
        table = table.at[jnp.where(a_p, slot, TB)].min(ids, mode="drop")
    h = h + table[0].astype(jnp.uint32)
    return h, p, a_s, a_p, sg, og


# 3. + ptable + gathers + cand
def r_cand(i, lanes, ids, h, p, a_s, a_p, sg, og):
    h, p = hash_upd(i, h, p)
    slots_p = []
    table = jnp.full((TB,), BIG, dtype=jnp.int32)
    for mix in MIXES:
        slot = ((p * mix) >> SHIFT).astype(jnp.int32)
        slots_p.append(slot)
        table = table.at[jnp.where(a_p, slot, TB)].min(ids, mode="drop")
    ptable = jnp.zeros((TB,), dtype=jnp.uint32)
    for slot in slots_p:
        win = a_p & (jnp.take(table, slot) == ids)
        ptable = ptable.at[jnp.where(win, slot, TB)].set(p, mode="drop")
    cand = jnp.full((N,), BIG, dtype=jnp.int32)
    for mix in MIXES:
        slot_s = ((h * mix) >> SHIFT).astype(jnp.int32)
        cj = jnp.take(table, slot_s)
        pj = jnp.take(ptable, slot_s)
        okj = (cj < BIG) & (cj != ids) & (pj == h)
        cand = jnp.where((cand == BIG) & okj, cj, cand)
    h = h + cand.astype(jnp.uint32)
    return h, p, a_s, a_p, sg, og


# 4. + verify
def r_verify(i, lanes, ids, h, p, a_s, a_p, sg, og):
    h, p = hash_upd(i, h, p)
    slots_p = []
    table = jnp.full((TB,), BIG, dtype=jnp.int32)
    for mix in MIXES:
        slot = ((p * mix) >> SHIFT).astype(jnp.int32)
        slots_p.append(slot)
        table = table.at[jnp.where(a_p, slot, TB)].min(ids, mode="drop")
    ptable = jnp.zeros((TB,), dtype=jnp.uint32)
    for slot in slots_p:
        win = a_p & (jnp.take(table, slot) == ids)
        ptable = ptable.at[jnp.where(win, slot, TB)].set(p, mode="drop")
    cand = jnp.full((N,), BIG, dtype=jnp.int32)
    for mix in MIXES:
        slot_s = ((h * mix) >> SHIFT).astype(jnp.int32)
        cj = jnp.take(table, slot_s)
        pj = jnp.take(ptable, slot_s)
        okj = (cj < BIG) & (cj != ids) & (pj == h)
        cand = jnp.where((cand == BIG) & okj, cj, cand)
    has_cand = a_s & (cand < BIG)
    pr_id = jnp.clip(cand, 0, N_GLOB - 1)
    eq = _suffix_eq_prefix_exact(jax, jnp, lanes, None, lanes, None, pr_id, i, L, False)
    matched_c = has_cand & eq
    h = h + matched_c.astype(jnp.uint32)
    return h, p, a_s, a_p, sg, og


# 5. full round (as production, incl. claim + link scatters + cond)
def r_full(i, lanes, ids, h, p, a_s, a_p, sg, og):
    h, p = hash_upd(i, h, p)
    slots_p = []
    table = jnp.full((TB,), BIG, dtype=jnp.int32)
    for mix in MIXES:
        slot = ((p * mix) >> SHIFT).astype(jnp.int32)
        slots_p.append(slot)
        table = table.at[jnp.where(a_p, slot, TB)].min(ids, mode="drop")
    ptable = jnp.zeros((TB,), dtype=jnp.uint32)
    for slot in slots_p:
        win = a_p & (jnp.take(table, slot) == ids)
        ptable = ptable.at[jnp.where(win, slot, TB)].set(p, mode="drop")
    cand = jnp.full((N,), BIG, dtype=jnp.int32)
    for mix in MIXES:
        slot_s = ((h * mix) >> SHIFT).astype(jnp.int32)
        cj = jnp.take(table, slot_s)
        pj = jnp.take(ptable, slot_s)
        okj = (cj < BIG) & (cj != ids) & (pj == h)
        cand = jnp.where((cand == BIG) & okj, cj, cand)
    has_cand = a_s & (cand < BIG)
    pr_id = jnp.clip(cand, 0, N_GLOB - 1)
    eq = _suffix_eq_prefix_exact(jax, jnp, lanes, None, lanes, None, pr_id, i, L, False)
    matched_c = has_cand & eq
    claim = jnp.full((N_GLOB,), BIG, dtype=jnp.int32).at[
        jnp.where(matched_c, pr_id, N_GLOB)].min(ids, mode="drop")
    matched = matched_c & (jnp.take(claim, pr_id) == ids)
    sg = sg.at[jnp.where(matched, ids, N_GLOB)].set(cand, mode="drop")
    og = og.at[jnp.where(matched, ids, N_GLOB)].set(jnp.int32(L) - i, mode="drop")
    a_s = a_s & ~matched
    a_p = a_p & (jnp.take(claim, jnp.clip(ids, 0, N_GLOB - 1)) == BIG)
    return h, p, a_s, a_p, sg, og


args = (lanes, ids, h, p, a_s, a_p, succ_g, ovl_g)
print(f"overlap round ablation, n={N}, tb={TB}:", flush=True)
bench("1 hash updates only", loop(r_hash), args)
bench("2 + id-table 4x scatter-min", loop(r_table), args)
bench("3 + ptable + cand gathers", loop(r_cand), args)
bench("4 + exact verify", loop(r_verify), args)
bench("5 full round (claim + links)", loop(r_full), args)


# --- same full round but WITHOUT fori_loop (single round, jit per call) ---
def single(body):
    def fn(lanes, ids, h, p, a_s, a_p, sg, og):
        return body(jnp.int32(7), lanes, ids, h, p, a_s, a_p, sg, og)
    return fn

bench("5b full round, no fori_loop (1 round)", single(r_full), args, rounds=1)

# --- table-size sensitivity: full round at tb = 8*active for shrunk active ---
for frac in (4, 16):
    tb2 = TB // frac
    shift2 = np.uint32(32 - (tb2.bit_length() - 1))

    def r_small(i, lanes, ids, h, p, a_s, a_p, sg, og, tb2=tb2, shift2=shift2):
        h, p = hash_upd(i, h, p)
        slots_p = []
        table = jnp.full((tb2,), BIG, dtype=jnp.int32)
        for mix in MIXES:
            slot = ((p * mix) >> shift2).astype(jnp.int32)
            slots_p.append(slot)
            table = table.at[jnp.where(a_p, slot, tb2)].min(ids, mode="drop")
        ptable = jnp.zeros((tb2,), dtype=jnp.uint32)
        for slot in slots_p:
            win = a_p & (jnp.take(table, slot) == ids)
            ptable = ptable.at[jnp.where(win, slot, tb2)].set(p, mode="drop")
        cand = jnp.full((N,), BIG, dtype=jnp.int32)
        for mix in MIXES:
            slot_s = ((h * mix) >> shift2).astype(jnp.int32)
            cj = jnp.take(table, slot_s)
            pj = jnp.take(ptable, slot_s)
            okj = (cj < BIG) & (cj != ids) & (pj == h)
            cand = jnp.where((cand == BIG) & okj, cj, cand)
        has_cand = a_s & (cand < BIG)
        pr_id = jnp.clip(cand, 0, N_GLOB - 1)
        eq = _suffix_eq_prefix_exact(jax, jnp, lanes, None, lanes, None, pr_id, i, L, False)
        matched_c = has_cand & eq
        claim = jnp.full((N_GLOB,), BIG, dtype=jnp.int32).at[
            jnp.where(matched_c, pr_id, N_GLOB)].min(ids, mode="drop")
        matched = matched_c & (jnp.take(claim, pr_id) == ids)
        sg = sg.at[jnp.where(matched, ids, N_GLOB)].set(cand, mode="drop")
        og = og.at[jnp.where(matched, ids, N_GLOB)].set(jnp.int32(L) - i, mode="drop")
        a_s = a_s & ~matched
        a_p = a_p & (jnp.take(claim, jnp.clip(ids, 0, N_GLOB - 1)) == BIG)
        return h, p, a_s, a_p, sg, og

    bench(f"6 full round, tb/{frac} ({tb2})", loop(r_small), args)
