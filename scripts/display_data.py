"""Dataset stats table + ego-network plot CLI (reference
scripts/display_data.py): tabulated node/edge/feature/class counts plus a
depth-limited BFS ego-network PNG per dataset.

    python scripts/display_data.py --dataset sbm --depth 3 --save-dir .
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import os

from cogdl_tpu.pipelines import pipeline


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", "-d", nargs="+", default=["sbm"])
    parser.add_argument("--depth", type=int, default=3)
    parser.add_argument("--seed", "-s", type=int, default=-1)
    parser.add_argument("--save-dir", type=str, default=".")
    args = parser.parse_args()

    stats = pipeline("dataset-stats")
    stats(datasets=args.dataset)
    visual = pipeline("dataset-visual")
    for name in args.dataset:
        visual(dataset=name, seed=args.seed, depth=args.depth,
               out_file=os.path.join(args.save_dir, f"display_{name}.png"))


if __name__ == "__main__":
    main()
