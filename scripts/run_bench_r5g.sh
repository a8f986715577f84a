#!/bin/bash
cd /root/repo
python -u bench.py --sampled 2>&1 | sed 's/^/[sage] /'
python -u bench.py --model gat 2>&1 | sed 's/^/[gat100k] /'
python -u bench.py --products --model gat --warmup 1 --steps 1 --repeats 3 --block-chunks 512 2>&1 | sed 's/^/[gatprod] /'
