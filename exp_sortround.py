"""Prototype of the sort-based overlap round (to replace the scatter-table
round in greedy_scs._build_seg_fn). Validates pairing correctness against a
numpy oracle and slope-times the true device cost per round."""
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


N = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
L = 100
W = (L + 15) // 16
BIGI = np.int32(2 * N + 2)

B64 = np.uint64(0x9E3779B97F4A7C15)


def _modinv_u64(b: int) -> int:
    x = b
    for _ in range(6):
        x = (x * (2 - b * x)) & 0xFFFFFFFFFFFFFFFF
    return x


B64_INV = np.uint64(_modinv_u64(int(B64)))


def pow_table64(L):
    pows = np.ones(L + 1, dtype=np.uint64)
    v = 1
    for k in range(1, L + 1):
        v = (v * int(B64)) & 0xFFFFFFFFFFFFFFFF
        pows[k] = np.uint64(v)
    return pows


POWS64 = pow_table64(L)

rng = np.random.default_rng(0)
# half random, half overlapping chains so matches actually happen
codes = rng.integers(0, 4, size=(N, L)).astype(np.uint8)
base = rng.integers(0, 4, size=N * 3 + L).astype(np.uint8)
starts = np.sort(rng.integers(0, N * 3, size=N // 2))
for k, s in enumerate(starts):
    codes[k] = base[s : s + L]
lanes_np, _ = packed.pack_lanes(codes, N)
lanes = jnp.asarray(lanes_np)
ids_np = np.arange(N, dtype=np.int32)
ids = jnp.asarray(ids_np)

# initial full-read hash h0 (u64)
vals = codes.astype(np.uint64)
h0_np = (vals * POWS64[L - 1 :: -1][None, :L]).sum(axis=1, dtype=np.uint64)
h0 = jnp.asarray(h0_np)
INV64 = jnp.uint64(0xFFFFFFFFFFFFFFFF)
INV32 = jnp.uint32(0xFFFFFFFF)


def round_fn(i, lanes, ids, h, p, a_s, a_p, links):
    n = ids.shape[0]
    # rolling updates
    vi = g._col_vals(jax, jnp, lanes, None, i - 1, False).astype(jnp.uint64)
    h = h - vi * jnp.asarray(POWS64)[L - i]
    vm = g._col_vals(jax, jnp, lanes, None, L - i, False).astype(jnp.uint64)
    p = (p - vm) * B64_INV

    gid_u = ids.astype(jnp.uint32)
    k1 = jnp.concatenate([jnp.where(a_p, p, INV64), jnp.where(a_s, h, INV64)])
    k2 = jnp.concatenate([
        jnp.where(a_p, gid_u, INV32),
        jnp.where(a_s, gid_u | jnp.uint32(0x80000000), INV32),
    ])
    pay = jnp.concatenate([ids, ids])  # local row
    k1s, k2s, prs = jax.lax.sort((k1, k2, pay), num_keys=2, is_stable=False)

    m = 2 * n
    idx = jnp.arange(m, dtype=jnp.int32)
    valid = k2s != INV32
    side = (k2s >> jnp.uint32(31)).astype(jnp.int32)  # 0 pref, 1 suf (invalid->1)
    gid_s = (k2s & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    same_prev = jnp.concatenate([jnp.zeros(1, jnp.bool_), k1s[1:] == k1s[:-1]])
    boundary = valid & ~same_prev
    is_suf = valid & (side == 1)
    is_pref = valid & (side == 0)
    seg_start = jax.lax.cummax(jnp.where(boundary, idx, 0))
    prev_is_suf = jnp.concatenate([jnp.zeros(1, jnp.bool_), is_suf[:-1]])
    first_suf = is_suf & (~prev_is_suf | boundary)
    fs_bwd = jax.lax.cummax(jnp.where(first_suf, idx, -1))
    # forward-looking (for prefixes): next boundary, next first_suf
    nb = jax.lax.cummin(jnp.where(boundary, idx, BIGI), reverse=True)
    seg_end = jnp.concatenate([nb[1:], jnp.full(1, BIGI, jnp.int32)])
    seg_end = jnp.minimum(seg_end, jnp.int32(m))
    fs_fwd = jax.lax.cummin(jnp.where(first_suf, idx, BIGI), reverse=True)

    # suffix pairing
    r = idx - fs_bwd
    P = fs_bwd - seg_start
    partner_pos = seg_start + r
    paired = is_suf & (fs_bwd >= 0) & (r < P)
    pk2 = jnp.take(k2s, jnp.clip(partner_pos, 0, m - 1))
    partner_gid = (pk2 & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    suf_ok = paired & (partner_gid != gid_s)
    # prefix claimed-by-rank (over-claims on self-pairs: safe)
    S = seg_end - jnp.minimum(fs_fwd, seg_end)
    claimed = is_pref & ((idx - seg_start) < S)

    contributes = suf_ok | claimed
    val = jnp.where(
        suf_ok, partner_gid.astype(jnp.int64) + 1, jnp.int64(0)
    ) + jnp.where(claimed, jnp.int64(1) << 32, jnp.int64(0))
    rowv = jnp.zeros((n,), jnp.int64).at[
        jnp.where(contributes, prs, n)
    ].add(val, mode="drop")

    cand = (rowv & jnp.int64(0xFFFFFFFF)).astype(jnp.int32) - 1
    claimed_row = (rowv >> jnp.int64(32)) > 0
    has_cand = cand >= 0
    pr_id = jnp.clip(cand, 0, n - 1)
    eq = _suffix_eq_prefix_exact(jax, jnp, lanes, None, lanes, None, pr_id, i, L, False)
    matched = has_cand & eq
    links = links.at[jnp.where(matched, ids, n)].set(
        ((jnp.int64(L) - i) << 32) | cand.astype(jnp.int64), mode="drop"
    )
    a_s = a_s & ~matched
    a_p = a_p & ~claimed_row
    return h, p, a_s, a_p, links


def make(R, i_of=None):
    def fn(lanes, ids, h, p):
        a_s = jnp.ones(N, jnp.bool_)
        a_p = jnp.ones(N, jnp.bool_)
        links = jnp.full((N,), -1, jnp.int64)
        def b(k, c):
            i = jnp.int32(1 + (k % 60)) if i_of is None else jnp.int32(i_of(k))
            h, p, a_s, a_p, links = c
            return round_fn(i, lanes, ids, h, p, a_s, a_p, links)
        return jax.lax.fori_loop(0, R, b, (h, p, a_s, a_p, links))
    return jax.jit(fn)


# ---- correctness check on small N via sequential rounds vs numpy oracle ----
def check():
    f = make(30, i_of=lambda k: k + 1)
    h, p, a_s, a_p, links = f(lanes, ids, h0, h0)
    links = np.asarray(jax.device_get(links))
    succ = (links & 0xFFFFFFFF).astype(np.int64)
    succ[links < 0] = -1
    ovl = (links >> 32).astype(np.int64)
    ovl[links < 0] = 0
    nlink = int((succ >= 0).sum())
    # every link must satisfy suffix==prefix exactly
    bad = 0
    for r in np.nonzero(succ >= 0)[0][:5000]:
        o = int(ovl[r])
        if not np.array_equal(codes[r, L - o :], codes[succ[r], :o]):
            bad += 1
    # functional: no two preds
    cnt = np.bincount(succ[succ >= 0], minlength=N)
    print(f"links={nlink} bad={bad} max_preds={cnt.max()} "
          f"total_ovl={int(ovl.sum())}", flush=True)
    assert bad == 0 and cnt.max() <= 1


check()

# ---- slope timing ----
for R in (4, 64):
    f = make(R)
    out = f(lanes, ids, h0, h0)
    _ = np.asarray(jax.device_get(out[4][0]))
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = f(lanes, ids, h0, h0)
        _ = np.asarray(jax.device_get(out[4][0]))
        ts.append(time.time() - t0)
    print(f"R={R}: {min(ts)*1e3:.1f} ms", flush=True)
