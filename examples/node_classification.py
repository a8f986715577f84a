"""Full-batch node classification across several GNNs.

    python examples/node_classification.py            # synthetic (offline)
    python examples/node_classification.py cora       # with planetoid files
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from cogdl_tpu import experiment

dataset = sys.argv[1] if len(sys.argv) > 1 else "sbm"
experiment(dataset=dataset, model=["gcn", "gat", "appnp"], seed=[0, 1],
           epochs=200, use_best_config=(dataset != "sbm"))
