#!/bin/sh
# One-shot hardware measurement battery for the Pallas kernels. Run on a
# live TPU attach; each script A/Bs in-process (session variance safe) and
# asserts output equality before timing. Logs to hw_battery_<ts>.
# (reg_ab.py was removed in round 4 with the pruned LM kernel; the slab
# probes cover the round-4 kNN work.)
set -x
out="hw_battery_$(date +%H%M%S).log"
{
  echo "== canary + bench scan_to_scan =="
  timeout 1200 python bench.py
  echo "== extract oracle ground-truth check =="
  timeout 3000 python scripts/extract_oracle_check.py
  echo "== extract_ab (sector sort / assemble / NMS kernels) =="
  timeout 3000 python scripts/extract_ab.py
  echo "== map_insert_ab (sort2 / scatter / bitonic-network inserts) =="
  timeout 3000 python scripts/map_insert_ab.py
  echo "== knn in-loop decomposition (slab path) =="
  timeout 3000 python scripts/knn_inloop_decomp.py
  echo "== bench scan_to_map =="
  LOAM_BENCH_MODE=scan_to_map timeout 1200 python bench.py
} 2>&1 | tee "$out"
