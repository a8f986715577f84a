"""Dataset fetch/verify CLI (reference scripts/download.py).

``--fetch`` drives the download lifecycle (``cogdl_tpu.datasets.download``:
atomic fetch + md5 + extract) for datasets with registered URLs; without it
the script *verifies*: if the raw files are in place it loads and prints the
graph, otherwise it prints the loader's file-placement instructions. (This
environment has no network egress, so --fetch only succeeds on file:// or
pre-placed mirrors — the lifecycle itself is exercised by
tests/test_datasets.py.)

    python scripts/download.py --dataset cora chameleon grb-cora
    python scripts/download.py --dataset cora --fetch
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from cogdl_tpu.datasets import DATA_ROOT, SUPPORTED_DATASETS, build_dataset
from cogdl_tpu.datasets.download import DATASET_URLS, fetch_dataset


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", "-d", nargs="+", required=True,
                        choices=sorted(SUPPORTED_DATASETS))
    parser.add_argument("--fetch", action="store_true",
                        help="download registered raw files first")
    args = parser.parse_args()
    for name in args.dataset:
        if args.fetch:
            if name in DATASET_URLS:
                try:
                    folder = fetch_dataset(name)
                    print(f"{name}: fetched into {folder}")
                except OSError as e:
                    print(f"{name}: fetch failed — {e}")
            else:
                print(f"{name}: no URL registry entry; manual placement "
                      f"needed (see below)")
        try:
            ds = build_dataset(name)
            print(f"{name}: OK — {ds}")
        except FileNotFoundError as e:
            print(f"{name}: raw files not found under {DATA_ROOT}.\n  {e}")


if __name__ == "__main__":
    main()
