#!/bin/bash
# Sequential A/B sweep: packing levers on the fused passes (runs detached)
cd /root/repo
P=scripts/microbench_gat_pass.py
python -u $P --nodes 1000000 --avg-degree 50 --modes fwd,dsrc,spmm --drop-empty                 2>&1 | sed 's/^/[drop] /'
python -u $P --nodes 1000000 --avg-degree 50 --modes fwd,dsrc,spmm --drop-empty --block-chunks 512  2>&1 | sed 's/^/[drop+bc512] /'
python -u $P --nodes 1000000 --avg-degree 50 --modes fwd,dsrc,spmm --drop-empty --r-tile 1024   2>&1 | sed 's/^/[drop+r1024] /'
