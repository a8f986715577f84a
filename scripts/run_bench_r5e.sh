#!/bin/bash
cd /root/repo
# activation-compression memory A/B at products (GCN, no prop-cache so the
# layer actually holds activations; prop-cache folds layer 1 away)
python -u bench.py --products --no-prop-cache 2>&1 | sed 's/^/[gcn-exact] /'
python -u bench.py --products --no-prop-cache --act-compress 2>&1 | sed 's/^/[gcn-act8] /'
