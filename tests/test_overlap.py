import numpy as np
import pytest

from pgrc_tpu.overlap import greedy_scs


def sample_genome_reads(n_reads, read_len, genome_len, seed=0, exact=True):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, size=genome_len, dtype=np.uint8)
    starts = rng.integers(0, genome_len - read_len, size=n_reads)
    idx = starts[:, None] + np.arange(read_len)[None, :]
    return genome[idx]


def check_links_exact(codes, res):
    n, L = codes.shape
    for a in range(n):
        b = res.succ[a]
        if b < 0:
            continue
        o = res.overlap[a]
        assert o >= 1
        assert np.array_equal(codes[a, L - o:], codes[b, :o]), (a, b, o)


def check_degrees(res):
    has = res.succ >= 0
    succs = res.succ[has]
    assert np.unique(succs).size == succs.size, "a read has two predecessors"


def test_overlap_links_are_exact_and_unique():
    codes = sample_genome_reads(300, 50, 600, seed=1)
    res = greedy_scs.find_overlaps(codes)
    check_links_exact(codes, res)
    check_degrees(res)


def test_duplicates_linked_full_overlap():
    rng = np.random.default_rng(2)
    base = rng.integers(0, 4, size=(10, 40), dtype=np.uint8)
    codes = np.repeat(base, 3, axis=0)  # each read 3 times
    res = greedy_scs.find_overlaps(codes)
    full = (res.overlap == 40) & (res.succ >= 0)
    # each group of 3 contributes 2 full-overlap links
    assert full.sum() == 20
    check_links_exact(codes, res)
    check_degrees(res)


def test_cycle_removal():
    # construct reads that force a cycle: rotations of a cyclic string
    s = np.array([0, 1, 2, 3, 0, 1, 2, 3, 1, 1, 2, 0], dtype=np.uint8)
    L = 8
    doubled = np.concatenate([s, s])
    codes = np.stack([doubled[i : i + L] for i in range(0, len(s), 2)])
    res = greedy_scs.find_overlaps(codes)
    greedy_scs.remove_cycles(res)
    # no cycles: following succ always terminates
    n = codes.shape[0]
    for start in range(n):
        seen = set()
        x = start
        while res.succ[x] >= 0:
            assert x not in seen
            seen.add(x)
            x = int(res.succ[x])
    check_links_exact(codes, res)


def test_pg_assembly_reconstructs_reads():
    codes = sample_genome_reads(500, 60, 1500, seed=3)
    pg, order, pos = greedy_scs.generate_pseudogenome(codes)
    n, L = codes.shape
    assert order.shape == (n,)
    # every read's content appears at its position
    for k in range(n):
        r = order[k]
        p = pos[k]
        np.testing.assert_array_equal(pg[p : p + L], codes[r])
    # offsets monotone
    assert (np.diff(pos) >= 0).all()
    assert (np.diff(pos) <= L).all()


def test_pg_length_accounting():
    codes = sample_genome_reads(400, 50, 1000, seed=4)
    res = greedy_scs.find_overlaps(codes)
    greedy_scs.remove_cycles(res)
    layout = greedy_scs.layout_chains(res)
    n, L = codes.shape
    expected = n * L - int(res.overlap.sum())
    assert layout.pg_len == expected


def test_pg_compresses_genome_reads():
    # high coverage -> pg length should approach genome length, far below N*L
    codes = sample_genome_reads(2000, 50, 2000, seed=5)
    pg, order, pos = greedy_scs.generate_pseudogenome(codes)
    assert pg.shape[0] < 2000 * 50 * 0.12  # >8x shrink at 50x coverage
    # a greedy SCS approaches genome length at high coverage
    assert pg.shape[0] > 2000 * 0.9


def test_both_sides_overlapped_division():
    codes = sample_genome_reads(1000, 50, 3000, seed=6)
    # append random junk reads that should not overlap well
    rng = np.random.default_rng(7)
    junk = rng.integers(0, 4, size=(50, 50), dtype=np.uint8)
    allc = np.concatenate([codes, junk])
    res = greedy_scs.find_overlaps(allc, coef=0.65)
    keep = greedy_scs.both_sides_overlapped(res)
    # most genome reads kept, most junk dropped
    assert keep[:1000].mean() > 0.6
    assert keep[1000:].mean() < 0.3


def test_partitioned_sweep_matches_quality():
    """Oversized inputs partition the sweep (parts + cross-part repair,
    the 100M enablement). Forcing tiny parts must still produce a valid,
    near-equally-linked overlap graph and an equivalent pseudogenome."""
    import numpy as np
    from pgrc_tpu.overlap import greedy_scs as g

    rng = np.random.default_rng(11)
    genome = rng.integers(0, 4, size=6000, dtype=np.uint8)
    starts = rng.integers(0, genome.size - 60, size=1800)
    codes = genome[starts[:, None] + np.arange(60)[None, :]].astype(np.uint8)

    ref = g.find_overlaps(codes, coef=1.0)
    old_host, old_max = g._HOST_SWEEP_MAX, g._SWEEP_MAX_ROWS
    try:
        g._HOST_SWEEP_MAX = 0
        g._SWEEP_MAX_ROWS = 600          # force 3 parts
        part = g.find_overlaps(codes, coef=1.0)
    finally:
        g._HOST_SWEEP_MAX, g._SWEEP_MAX_ROWS = old_host, old_max
    # links are exact-verified inside find_overlaps; check coverage stays
    # close to the global sweep (cross-part repair must recover most)
    n_ref = int((ref.succ >= 0).sum())
    n_part = int((part.succ >= 0).sum())
    assert n_part >= 0.97 * n_ref, (n_part, n_ref)
    # total overlap (pg-shortening power): parts of a THIRD the coverage
    # lose some overlap length by construction (at the real 48M-row split
    # threshold each part keeps high coverage); bound the loss
    assert part.overlap.sum() >= 0.85 * ref.overlap.sum()
