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
    api._cap_cache[key] = (512, 256, 4)  # ne3c=4 truncates busy windows
    got, stats = api.align_pairs(texts, queries, cfg, return_stats=True)
    api._cap_cache.clear()
    assert stats.retried_pairs > 0  # overflow lanes actually retried
    for a, o in zip(got, oracle):
        assert (a.edit_distance, a.cigar) == (o.edit_distance, o.cigar)
