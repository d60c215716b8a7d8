"""Worker for the real 2-process jax.distributed test (run by
test_distributed.test_two_process_allgather_end_to_end).

Usage: python tests/dist_worker.py <pid> <nproc> <port> <out_json>
Each process builds the SAME deterministic dataset, aligns its round-robin
pair shard, gathers globally, and dumps (edit_distance, cigar) per pair.
Must be launched with JAX_PLATFORMS=cpu (before interpreter start).
"""

import json
import sys


def main():
    pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    # initialize BEFORE any import that could touch the XLA backend
    from scrooge_tpu.parallel import distributed as dist

    dist.initialize(coordinator_address=f"127.0.0.1:{port}",
                    num_processes=nproc, process_id=pid)
    from scrooge_tpu import AlignConfig
    from scrooge_tpu.utils.simulate import simulate_dataset
    ds = simulate_dataset(genome_len=20_000, num_reads=24, read_len=300,
                          seed=17)
    cfg = AlignConfig(backend="xla", batch_tile=128)
    alns = dist.align_reads_distributed(ds.genome, ds.reads, cfg,
                                        gather=True)
    with open(out_path, "w") as f:
        json.dump([[a.edit_distance, a.cigar] for a in alns], f)


if __name__ == "__main__":
    main()
