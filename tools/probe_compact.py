"""Device-time split of the postprocess pipeline at the headline shape:
engine core vs run-compaction+tokenize vs token-compaction vs readback.

Each stage is forced (1-element readback) so the wall splits are real
device+link time, not dispatch enqueue. Run on the TPU rig only.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))

import numpy as np  # noqa: E402


def force(x):
    import jax.numpy as jnp

    np.asarray(jnp.ravel(x)[:1])
    return x


def main():
    from scrooge_tpu import native
    from scrooge_tpu.api import _bucket_lin, _device_put_synced, AlignStats
    from scrooge_tpu.config import AlignConfig
    from scrooge_tpu.ops import engine_pallas, engine_xla, tokens
    from scrooge_tpu.utils.simulate import simulate_dataset

    reads_n = int(os.environ.get("PROBE_READS", "32768"))
    read_len = int(os.environ.get("PROBE_READ_LEN", "10000"))
    cfg = AlignConfig(W=64, K=64, O=33, batch_tile=reads_n)
    ds = simulate_dataset(genome_len=1_000_000, num_reads=reads_n,
                          read_len=read_len, accuracy=0.95, seed=7)
    genome_words = native.encode_pack_strs([ds.genome.content],
                                           _bucket_lin(1_000_000, 1 << 22))[0]
    P = _bucket_lin(read_len + 100, 1024)
    pat = native.encode_pack_strs([r.content for r in ds.reads], P)
    starts = np.array([r.locations[0].start_in_reference for r in ds.reads],
                      np.uint32)
    tlen = np.minimum(1_000_000 - starts.astype(np.int64),
                      cfg.max_windows(read_len) * cfg.tb_limit + cfg.W
                      ).astype(np.int32)
    plen = np.array([len(r.content) for r in ds.reads], np.int32)
    maxw = -(-cfg.max_windows(read_len) // 32) * 32
    sk, kw = engine_pallas.choose_kernel_shape(cfg, reads_n // 128)
    print(f"sk={sk} kw={kw} maxw={maxw}")

    stats = AlignStats()
    g, s, tl, p, pl = _device_put_synced(genome_words, starts, tlen, pat,
                                         plen, stats=stats)
    for it in range(3):
        t0 = time.perf_counter()
        res = engine_pallas.align_batch_mapped(cfg, maxw, sk, kw, g, s, tl,
                                               p, pl)
        meta = np.asarray(engine_xla.batch_meta(res))
        t1 = time.perf_counter()
        cap = _bucket_lin(int(meta[1].max()), 512)
        wmax = int(meta[3].max()) if meta.shape[0] > 3 else 0
        ne3c = 1 << max(2, (max(wmax, 1) - 1).bit_length()) if wmax else 0
        toks2, _, tok_tot_dev = tokens.compact_tokenize(
            res.entries, res.counts, cap, True, ne3c)
        tok_tot = np.asarray(tok_tot_dev)
        t2 = time.perf_counter()
        capT = _bucket_lin(int(tok_tot.max()), 128)
        toksc = force(tokens.compact_tokens(toks2, capT))
        t3 = time.perf_counter()
        host = np.asarray(toksc)
        t4 = time.perf_counter()
        t5 = time.perf_counter()
        cigars = native.format_tokens(host, tok_tot)
        t6 = time.perf_counter()
        print(f"it{it}: core+meta={t1-t0:.3f}s compact_tokenize={t2-t1:.3f}s "
              f"token_compact={t3-t2:.3f}s readback={t4-t3:.3f}s"
              f"/{host.nbytes/1e6:.1f}MB format={t6-t5:.3f}s "
              f"cap={cap} capT={capT} ne3c={ne3c}")


if __name__ == "__main__":
    main()
