"""Published profiling-results fetcher (scripts/download_profile.py analogue).

Downloads the reference paper's full per-config sweep CSVs from Zenodo
(record 6736836, scripts/download_profile.py:5) and unpacks them into
--profile_dir, so the plotting tooling (scrooge_tpu.profiling.plots) can be
pointed at the published data for side-by-side comparison with locally
recorded sweeps.

In air-gapped environments this fails gracefully with a pointer to the
locally recorded sweep CSVs under profile/.
"""

from __future__ import annotations

import argparse
import os
import sys
import tarfile
import urllib.request

ZENODO_URL = ("https://zenodo.org/record/6736836/files/"
              "scrooge_profile.tar.gz")


def download(profile_dir: str, url: str = ZENODO_URL) -> int:
    os.makedirs(profile_dir, exist_ok=True)
    tar_path = os.path.join(profile_dir, "profile.tar.gz")
    print(f"downloading {url} ...", file=sys.stderr)
    try:
        urllib.request.urlretrieve(url, tar_path)
    except OSError as e:
        print(f"download failed ({e}); this environment may have no "
              "network egress — locally recorded sweeps live under "
              "profile/ (regenerate with scrooge_tpu.profiling.sweep)",
              file=sys.stderr)
        return 1
    with tarfile.open(tar_path) as tar:
        tar.extractall(profile_dir, filter="data")
    os.remove(tar_path)
    print(f"unpacked into {profile_dir}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--profile_dir", default="profile/published")
    p.add_argument("--url", default=ZENODO_URL)
    args = p.parse_args(argv)
    return download(args.profile_dir, args.url)


if __name__ == "__main__":
    sys.exit(main())
