#!/bin/sh
# One-shot hardware measurement battery for the Pallas kernels. Run on a
# live TPU attach; each script A/Bs in-process (session variance safe) and
# asserts output equality before timing. Logs to hw_battery_<ts>.
# (reg_ab.py was removed in round 4 with the pruned LM kernel; the slab
# mode itself was pruned in round 5 — knn_inloop_decomp covers the kNN
# visit schedule. Round 5 adds the streaming dataset mode + the unroll A/B
# guard via the oracle check's public-batch-API assertions.)
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
  echo "== knn in-loop decomposition =="
  timeout 3000 python scripts/knn_inloop_decomp.py
  echo "== bench scan_to_map =="
  LOAM_BENCH_MODE=scan_to_map timeout 1200 python bench.py
  echo "== bench dataset (streaming, packed wire) =="
  LOAM_BENCH_MODE=dataset timeout 1200 python bench.py
} 2>&1 | tee "$out"
