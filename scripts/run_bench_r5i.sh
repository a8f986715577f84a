#!/bin/bash
cd /root/repo
python -u bench.py --sampled --products 2>&1 | sed 's/^/[ssage-prod] /'
python -u bench.py --sampled --products --model gat 2>&1 | sed 's/^/[sgat-prod] /'
