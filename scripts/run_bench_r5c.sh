#!/bin/bash
cd /root/repo
export PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python
# GAT products: phase-barrier A/B at the new layout
python -u bench.py --products --model gat --warmup 1 --steps 1 --repeats 3 --block-chunks 512 --gat-nophase 2>&1 | sed 's/^/[gat-nophase] /'
# sampled-GAT per-op profile (VERDICT #6)
python -u scripts/profile_sampled.py --model gat 2>&1 | sed 's/^/[prof-sgat] /'
# sampled GAT + SAGE throughput refresh
python -u bench.py --sampled --model gat 2>&1 | sed 's/^/[sampled-gat] /'
python -u bench.py --sampled 2>&1 | sed 's/^/[sampled-sage] /'
