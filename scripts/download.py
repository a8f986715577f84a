"""Dataset fetch/verify CLI (reference scripts/download.py). This
environment has no network access, so instead of downloading this script
*verifies* each dataset: if the raw files are in place it loads and prints
the graph; otherwise it prints the loader's file-placement instructions.

    python scripts/download.py --dataset cora chameleon grb-cora
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from cogdl_tpu.datasets import DATA_ROOT, SUPPORTED_DATASETS, build_dataset


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", "-d", nargs="+", required=True,
                        choices=sorted(SUPPORTED_DATASETS))
    args = parser.parse_args()
    for name in args.dataset:
        try:
            ds = build_dataset(name)
            print(f"{name}: OK — {ds}")
        except FileNotFoundError as e:
            print(f"{name}: raw files not found under {DATA_ROOT}.\n  {e}")


if __name__ == "__main__":
    main()
