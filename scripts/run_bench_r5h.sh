#!/bin/bash
cd /root/repo
python -u bench.py --products --model gat --attn-drop 0.1 --warmup 1 --steps 1 --repeats 3 --block-chunks 512 2>&1 | sed 's/^/[drop01] /'
python -u bench.py --model gat --nodes 200000 2>&1 | sed 's/^/[gat200k] /'
