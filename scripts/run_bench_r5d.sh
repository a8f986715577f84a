#!/bin/bash
cd /root/repo
# sampled GAT at B=4096 (amortisation check, VERDICT #6)
python -u bench.py --sampled --model gat --batch-size 4096 2>&1 | sed 's/^/[sgat-b4096] /'
# GAT 100k single-shot refresh at the r5 kernel (merged epilogue inactive at
# HD=128; phase barrier kept on single-shot) - regression check
python -u bench.py --model gat 2>&1 | sed 's/^/[gat-100k] /'
# GCN 100k default refresh (driver metric)
python -u bench.py 2>&1 | sed 's/^/[gcn-100k] /'
# sampled GAT products refresh
python -u bench.py --sampled --products 2>&1 | sed 's/^/[sampled-products] /'
