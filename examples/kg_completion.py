"""Knowledge-graph completion with the TransE family."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from cogdl_tpu import experiment

experiment(dataset="random-kg", model=["transe", "rotate", "distmult"],
           seed=0, epochs=60, hidden_size=64)
