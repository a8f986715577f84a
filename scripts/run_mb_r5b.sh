#!/bin/bash
cd /root/repo
P=scripts/microbench_gat_pass.py
# REAL products shapes: 2.45M nodes powerlaw, H=8 D=16 (HD=128)
python -u $P --powerlaw --nodes 2450000 --avg-degree 50 --heads 8 --dim 16 --modes fwd,dsd,dsrc,spmm 2>&1 | sed 's/^/[r512-bc2048] /'
python -u $P --powerlaw --nodes 2450000 --avg-degree 50 --heads 8 --dim 16 --modes fwd,dsd,dsrc,spmm --block-chunks 512 2>&1 | sed 's/^/[r512-bc512] /'
python -u $P --powerlaw --nodes 2450000 --avg-degree 50 --heads 8 --dim 16 --modes fwd,dsd,dsrc,spmm --r-tile 1024 --block-chunks 512 2>&1 | sed 's/^/[r1024-bc512] /'
