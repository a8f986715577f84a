#!/bin/bash
cd /root/repo
python -u bench.py --products 2>&1 | sed 's/^/[gcn-default] /'
python -u bench.py --products --block-chunks 512 2>&1 | sed 's/^/[gcn-bc512-again] /'
python -u bench.py --products --block-chunks 1024 2>&1 | sed 's/^/[gcn-bc1024] /'
