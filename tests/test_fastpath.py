"""Predicted-cap fast path: after a first (slow, cap-syncing) tile, the
compaction caps are cached per (config, window count) and subsequent
tiles dispatch the whole device chain without mid-pipeline syncs.
Outputs must be identical either way; overflowing lanes must fail to the
retry path, not silently truncate."""

import numpy as np

from scrooge_tpu import api
from scrooge_tpu.config import AlignConfig


def _pairs(n, tlen, plen, rate, seed):
    rng = np.random.default_rng(seed)
    bases = "ACGT"
    texts, queries = [], []
    for _ in range(n):
        t = "".join(rng.choice(list(bases)) for _ in range(tlen))
        q = "".join(c if rng.random() > rate
                    else bases[int(rng.integers(4))] for c in t[:plen])
        texts.append(t)
        queries.append(q)
    return texts, queries


def test_fast_path_matches_slow_path():
    texts, queries = _pairs(8, 300, 240, 0.05, 21)
    cfg = AlignConfig(W=64, K=64, O=33, backend="xla", batch_tile=128)
    api._cap_cache.clear()
    first = api.align_pairs(texts, queries, cfg)
    assert api._cap_cache  # slow path populated the cache
    second = api.align_pairs(texts, queries, cfg)  # fast path
    for a, b in zip(first, second):
        assert (a.edit_distance, a.cigar) == (b.edit_distance, b.cigar)


def test_fast_path_truncating_caps_still_exact():
    """Caps smaller than the actual run totals must never corrupt output:
    lanes overflow -> retry -> exact results."""
    texts, queries = _pairs(6, 400, 340, 0.2, 23)  # many runs per pair
    cfg = AlignConfig(W=64, K=64, O=33, backend="xla", batch_tile=128)
    oracle = api.align_pairs(texts, queries,
                             AlignConfig(W=64, K=64, O=33, backend="pyref"))
    api._cap_cache.clear()
    api.align_pairs(texts[:2], queries[:2], cfg)
    key = next(iter(api._cap_cache))
    api._cap_cache[key] = (512, 256, 4, 0)  # ne3c=4 truncates busy windows
    got, stats = api.align_pairs(texts, queries, cfg, return_stats=True)
    api._cap_cache.clear()
    assert stats.retried_pairs > 0  # overflow lanes actually retried
    for a, o in zip(got, oracle):
        assert (a.edit_distance, a.cigar) == (o.edit_distance, o.cigar)


def test_fast_path_window_cap_truncation_still_exact():
    """A window-axis cap (wcap) smaller than some lanes' windows-used
    must fail those lanes to the retry, never truncate output silently."""
    texts, queries = _pairs(6, 400, 340, 0.05, 31)
    cfg = AlignConfig(W=64, K=64, O=33, backend="xla", batch_tile=128)
    oracle = api.align_pairs(texts, queries,
                             AlignConfig(W=64, K=64, O=33, backend="pyref"))
    api._cap_cache.clear()
    api.align_pairs(texts[:2], queries[:2], cfg)
    key = next(iter(api._cap_cache))
    cap, capT, ne3c, _ = api._cap_cache[key]
    api._cap_cache[key] = (cap, capT, ne3c, 4)  # 340bp needs ~11 windows
    got, stats = api.align_pairs(texts, queries, cfg, return_stats=True)
    api._cap_cache.clear()
    assert stats.retried_pairs > 0
    for a, o in zip(got, oracle):
        assert (a.edit_distance, a.cigar) == (o.edit_distance, o.cigar)


def test_assemble_packed_identity_fast_path():
    """Single tile, no failures, identity lane order -> the zero-copy fast
    path must produce exactly what the general scatter path produces."""
    import numpy as np

    from scrooge_tpu.api import _assemble_packed_parts

    rng = np.random.default_rng(5)
    n = 257
    counts = rng.integers(1, 40, n).astype(np.int64)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=offs[1:])
    flat = rng.integers(0, 4 << 12, int(offs[-1]), dtype=np.uint16)
    idxs = np.arange(n)
    eds = rng.integers(0, 64, n).astype(np.int32)
    parts = [(flat, offs, idxs, eds, np.zeros(n, np.int32))]
    fast = _assemble_packed_parts(n, parts, [None] * n)
    # force the general path by shuffling the lane->pair map
    perm = rng.permutation(n)
    parts_g = [(flat, offs, perm, eds, np.zeros(n, np.int32))]
    gen = _assemble_packed_parts(n, parts_g, [None] * n)
    assert np.array_equal(fast.edit_distances, eds)
    assert np.array_equal(fast.run_offsets, offs)
    assert np.array_equal(fast.runs, flat)
    # cross-check: pair i of the general result == lane at perm==i
    for i in range(0, n, 17):
        lane = int(np.nonzero(perm == i)[0][0])
        a = gen.runs[gen.run_offsets[i]:gen.run_offsets[i + 1]]
        b = flat[offs[lane]:offs[lane + 1]]
        assert np.array_equal(a, b)
        assert gen.edit_distances[i] == eds[lane]
