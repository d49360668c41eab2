"""Pallas experiment: candidate-window verify with the packed pg resident in
VMEM (a 4M-symbol pg is only 1 MB packed — far under the ~16 MB VMEM).

The XLA formulation gathers [R, S, W+1] u32 lanes from HBM at ~11 ns per
element (~35 ms at R=131k, S=3). The Pallas kernel instead keeps pg_lanes in
VMEM and walks a read tile with a fori_loop of dynamic slices — if Mosaic's
VMEM dynamic-slice loads are cheap, the verify drops well under the gather
cost. Falls back to interpret mode off-TPU for correctness checking.

Usage: python exp_pallas_verify.py [interpret]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

# Mosaic rejects 64-bit types; run this experiment WITHOUT x64 (the
# production probe keeps positions i32 in the standard path anyway)
import os as _os

_os.environ["JAX_ENABLE_X64"] = "0"
import jax

env_plat = _os.environ.get("JAX_PLATFORMS")
if env_plat:
    try:
        jax.config.update("jax_platforms", env_plat)
    except RuntimeError:
        pass
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = len(sys.argv) > 1 and sys.argv[1] == "interpret"

R = 1024 if INTERPRET else 131072
S = 3
L = 100
W = (L + 15) // 16          # 7 lanes per read
PGL = 1 << 16 if INTERPRET else 1 << 18   # pg lanes (u32); 256k lanes = 1 MB
TILE = 256                  # reads per grid step

rng = np.random.default_rng(0)
pg_lanes = rng.integers(0, 1 << 32, size=PGL, dtype=np.uint64).astype(np.uint32)
read_lanes = rng.integers(0, 1 << 32, size=(R, 8), dtype=np.uint64).astype(np.uint32)
starts = rng.integers(0, (PGL - 8) * 16, size=(R, S)).astype(np.int32)
lane_mask = np.full(8, 0xFFFFFFFF, dtype=np.uint32)
tail = L - (W - 1) * 16
lane_mask[W - 1] = np.uint32((0xFFFFFFFF << (32 - 2 * tail)) & 0xFFFFFFFF)
lane_mask[7] = 0


def popcount(x):
    x = x - ((x >> jnp.uint32(1)) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> jnp.uint32(2)) & jnp.uint32(0x33333333))
    x = (x + (x >> jnp.uint32(4))) & jnp.uint32(0x0F0F0F0F)
    return (x * jnp.uint32(0x01010101)) >> jnp.uint32(24)


TAIL_MASK = int(lane_mask[W - 1])


def kernel(pg_ref, rl_ref, st_ref, out_ref):
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    mask = jnp.where(col < W - 1, jnp.uint32(0xFFFFFFFF),
                     jnp.where(col == W - 1, jnp.uint32(TAIL_MASK),
                               jnp.uint32(0)))

    def row_body(i, _):
        rl = rl_ref[i, :][None, :] & mask            # [1, 8]
        vals = []
        for s in range(S):                            # static unroll
            start = st_ref[i, s]
            q = start >> 4
            sh = ((start & 15) << 1).astype(jnp.uint32)
            tl = pg_ref[pl.ds(q, 9)][None, :]         # [1, 9] u32
            hi = tl[:, :8] << sh
            lo = jnp.where(sh > 0, tl[:, 1:9] >> (jnp.uint32(32) - sh),
                           jnp.uint32(0))
            aligned = (hi | lo) & mask
            x = aligned ^ rl
            y = (x | (x >> jnp.uint32(1))) & jnp.uint32(0x55555555)
            vals.append(popcount(y).sum(dtype=jnp.int32))
        out_ref[i, :] = jnp.stack(vals)               # vector store
        return _

    jax.lax.fori_loop(0, TILE, row_body, 0)


def run_pallas(pg, rl, st):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, S), jnp.int32),
        grid=(R // TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),          # whole pg
            pl.BlockSpec((TILE, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, S), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(pg, rl, st)


def run_xla(pg, rl, st):
    q = (st >> 4).astype(jnp.int32)
    s2 = ((st & 15) << 1).astype(jnp.uint32)
    lane_ids = jnp.clip(q[..., None] + jnp.arange(9, dtype=jnp.int32)[None, None, :],
                        0, PGL - 1)
    tl = jnp.take(pg, lane_ids)
    s2e = s2[..., None]
    hi = tl[..., :8] << s2e
    lo = jnp.where(s2e > 0, tl[..., 1:9] >> (jnp.uint32(32) - s2e), jnp.uint32(0))
    aligned = (hi | lo) & jnp.asarray(lane_mask)[None, None, :]
    x = aligned ^ (rl[:, None, :] & jnp.asarray(lane_mask)[None, None, :])
    y = (x | (x >> jnp.uint32(1))) & jnp.uint32(0x55555555)
    return popcount(y).sum(axis=-1).astype(jnp.int32)


pg_d, rl_d, st_d = jnp.asarray(pg_lanes), jnp.asarray(read_lanes), jnp.asarray(starts)
f_x = jax.jit(run_xla)
ox = f_x(pg_d, rl_d, st_d)
_ = np.asarray(jax.device_get(ox[0, 0]))
o_p = run_pallas(pg_d, rl_d, st_d)
op = np.asarray(jax.device_get(o_p))
oxh = np.asarray(jax.device_get(ox))
print("equal:", np.array_equal(op, oxh), flush=True)
if not INTERPRET:
    f_p = jax.jit(run_pallas)
    _ = np.asarray(jax.device_get(f_p(pg_d, rl_d, st_d)[0, 0]))
    for name, f in (("xla", f_x), ("pallas", f_p)):
        best = 9e9
        for _ in range(5):
            t0 = time.time()
            out = f(pg_d, rl_d, st_d)
            _ = np.asarray(jax.device_get(out[0, 0]))
            best = min(best, time.time() - t0)
        print(f"{name}: {best*1e3:.1f} ms", flush=True)
