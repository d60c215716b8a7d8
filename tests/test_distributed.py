"""Multi-host sharding logic tests (single-process semantics + shard math).

True multi-host runs need a jax.distributed cluster; here we validate the
pair-sharding arithmetic for arbitrary process counts and the end-to-end
single-process path (which the multi-host path reduces to per process).
"""

import random

import scrooge_tpu
from scrooge_tpu import AlignConfig, CandidateLocation, Genome, Read
from scrooge_tpu.parallel import distributed as dist


def _mk_reads(n, with_multi_locs=True):
    rng = random.Random(1)
    reads = []
    for i in range(n):
        content = "".join(rng.choice("ACGT") for _ in range(60))
        locs = [CandidateLocation(start_in_reference=0)]
        if with_multi_locs and i % 3 == 0:
            locs.append(CandidateLocation(start_in_reference=4))
        reads.append(Read(description=f"r{i}", content=content,
                          locations=locs))
    return reads


def test_shard_reads_partition_complete_and_disjoint():
    reads = _mk_reads(17)
    total = sum(len(r.locations) for r in reads)
    seen = []
    for pid in range(4):
        _, idxs = dist.shard_reads(reads, process_id=pid, process_count=4)
        seen.extend(idxs)
        # round-robin: every index owned by exactly its pid
        assert all(i % 4 == pid for i in idxs)
    assert sorted(seen) == list(range(total))


def test_shard_load_balance():
    reads = _mk_reads(100)
    total = sum(len(r.locations) for r in reads)
    counts = [len(dist.shard_reads(reads, process_id=p, process_count=8)[1])
              for p in range(8)]
    assert sum(counts) == total
    assert max(counts) - min(counts) <= 1


def test_single_process_distributed_matches_direct():
    rng = random.Random(5)
    genome_str = "".join(rng.choice("ACGT") for _ in range(2000))
    genome = Genome(content=genome_str)
    reads = []
    for i in range(12):
        start = rng.randint(0, 1500)
        content = genome_str[start : start + 120]
        reads.append(Read(description=f"r{i}", content=content,
                          locations=[CandidateLocation(
                              start_in_reference=start)]))
    cfg = AlignConfig(backend="xla", batch_tile=128)

    direct = scrooge_tpu.align_all(genome, reads, config=cfg)
    dist.initialize()  # single-process no-op
    via_dist = dist.align_reads_distributed(genome, reads, cfg)
    assert len(direct) == len(via_dist)
    for a, b in zip(direct, via_dist):
        assert (a.edit_distance, a.cigar) == (b.edit_distance, b.cigar)