"""CLI entry — reference scripts/train.py:1-9.

    python scripts/train.py --dataset sbm --model gcn --epochs 50
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from cogdl_tpu.options import main

if __name__ == "__main__":
    main()
