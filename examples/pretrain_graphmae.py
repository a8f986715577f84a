"""GraphMAE self-supervised pretraining + linear probe (BASELINE config 5)."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from cogdl_tpu.experiments import train

res = train("sbm", "graphmae", seed=0, epochs=100, hidden_size=128,
            eval_step=10)
print({k: round(v, 4) for k, v in res.items() if "acc" in k})
