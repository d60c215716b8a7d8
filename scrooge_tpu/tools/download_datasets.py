"""Dataset fetcher (scripts/download_datasets.py analogue).

Downloads the reference's evaluation datasets from Zenodo (record 7013734,
the tarball behind DATASETS.md) and unpacks them into --datasets_dir with
the profile.py layout contract: <dir>/<name>/{reference.fasta, reads.fastq,
candidates.[maf|paf]}.

In air-gapped environments use the built-in simulator instead:
  python -m scrooge_tpu.tools.download_datasets --simulate pbsim_like
generates a PBSIM2-style dataset locally (scrooge_tpu.utils.simulate).
"""

from __future__ import annotations

import argparse
import os
import sys
import tarfile
import urllib.request

ZENODO_URL = ("https://zenodo.org/record/7013734/files/"
              "scrooge_datasets.tar.gz")


def download(datasets_dir: str, url: str = ZENODO_URL) -> int:
    os.makedirs(datasets_dir, exist_ok=True)
    tar_path = os.path.join(datasets_dir, "datasets.tar.gz")
    print(f"downloading {url} ...", file=sys.stderr)
    try:
        urllib.request.urlretrieve(url, tar_path)
    except OSError as e:
        print(f"download failed ({e}); this environment may have no "
              "network egress — use --simulate instead", file=sys.stderr)
        return 1
    with tarfile.open(tar_path) as tar:
        tar.extractall(datasets_dir, filter="data")
    os.remove(tar_path)
    print(f"unpacked into {datasets_dir}")
    return 0


def simulate(datasets_dir: str, name: str, num_reads: int,
             read_len: int) -> int:
    from ..utils.simulate import simulate_dataset

    ds = simulate_dataset(genome_len=1_000_000, num_reads=num_reads,
                          read_len=read_len, accuracy=0.95, seed=11)
    out = os.path.join(datasets_dir, name)
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "reference.fasta"), "w") as f:
        f.write(">chr1\n")
        c = ds.genome.content
        for i in range(0, len(c), 80):
            f.write(c[i : i + 80] + "\n")
    with open(os.path.join(out, "reads.fastq"), "w") as f:
        for r in ds.reads:
            f.write(f"@{r.description}\n{r.content}\n+\n{'I'*len(r.content)}\n")
    with open(os.path.join(out, "candidates.paf"), "w") as f:
        for r in ds.reads:
            for loc in r.locations:
                L = len(r.content)
                f.write(f"{r.description}\t{L}\t0\t{L}\t+\tchr1\t"
                        f"{len(ds.genome.content)}\t{loc.start_in_chromosome}"
                        f"\t{loc.start_in_chromosome + L}\t{L}\t{L}\t60\n")
    print(f"wrote simulated dataset to {out}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--datasets_dir", default="datasets")
    p.add_argument("--url", default=ZENODO_URL)
    p.add_argument("--simulate", metavar="NAME",
                   help="generate a local PBSIM2-style dataset instead")
    p.add_argument("--num_reads", type=int, default=1000)
    p.add_argument("--read_len", type=int, default=10_000)
    args = p.parse_args(argv)
    if args.simulate:
        return simulate(args.datasets_dir, args.simulate, args.num_reads,
                        args.read_len)
    return download(args.datasets_dir, args.url)


if __name__ == "__main__":
    sys.exit(main())
