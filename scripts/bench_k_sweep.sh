#!/bin/bash
# Full-bench sweep of the walk-tile width K (headline Mrays/s per K).
set -u
cd /root/repo
for K in ${KS:-1 4 8 16}; do
  echo "=== TPU_RT_TILE_K=$K ==="
  TPU_RT_TILE_K=$K timeout 1800 python bench.py 2>&1 | tail -2
done
