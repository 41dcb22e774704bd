#!/bin/sh
# One-shot hardware measurement battery for the round-2 session-3 kernels.
# Run on a live TPU attach; each script A/Bs in-process (session variance
# safe) and asserts output equality before timing. Logs to hw_battery_<ts>.
set -x
out="hw_battery_$(date +%H%M%S).log"
{
  echo "== extract_ab (sector sort / assemble / NMS kernels) =="
  timeout 3000 python scripts/extract_ab.py
  echo "== reg_ab (LM kernel) =="
  timeout 3000 python scripts/reg_ab.py
  echo "== map_insert_ab (bitonic insert) =="
  timeout 3000 python scripts/map_insert_ab.py
  echo "== knn tile sweep =="
  timeout 3000 python scripts/knn_tile_sweep.py
  echo "== bench scan_to_scan =="
  timeout 3000 python bench.py
  echo "== bench scan_to_map =="
  LOAM_BENCH_MODE=scan_to_map timeout 3000 python bench.py
} 2>&1 | tee "$out"
