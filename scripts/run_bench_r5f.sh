#!/bin/bash
cd /root/repo
# last GAT products sweep: fewer/taller fw panels (13 panels, border-staging)
python -u bench.py --products --model gat --warmup 1 --steps 1 --repeats 3 --block-chunks 512 --panel-rows 188928 --panel-rows-bw 91136 2>&1 | sed 's/^/[fw188928] /'
# bw at r4's sweep optimum
python -u bench.py --products --model gat --warmup 1 --steps 1 --repeats 3 --block-chunks 512 --panel-rows-bw 92160 2>&1 | sed 's/^/[bw92160] /'
