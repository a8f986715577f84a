#!/bin/bash
cd /root/repo
# GAT products with per-direction panels (new default)
python -u bench.py --products --model gat --warmup 1 --steps 1 --repeats 3 2>&1 | sed 's/^/[gat-dirpanels] /'
# + block-chunks 512
python -u bench.py --products --model gat --warmup 1 --steps 1 --repeats 3 --block-chunks 512 2>&1 | sed 's/^/[gat-dirpanels-bc512] /'
# GCN products with bc512
python -u bench.py --products --block-chunks 512 2>&1 | sed 's/^/[gcn-bc512] /'
