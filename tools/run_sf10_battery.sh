#!/bin/bash
# Full-registry sf10 (1000x the driver gate) battery — round-11 close.
#
# Runs every oracle-backed key against /tmp/sf10 in chunks of 60 so a
# pathological key costs at most one chunk, with the streaming multiset
# digest compare (pass/fail-equivalent to the driver-faithful Counter
# compare, O(batch) memory — see tests/oracle.compare_digest).
#
# Exclusions (documented fixture/vehicle classes, see BASELINE.md):
#   containment_pairs_docs, supplier_er_clusters  (quadratic at synthetic
#       twin density — IMPRACTICAL_AT_SYNTHETIC_SF1, auto-excluded)
#   minhash_recall_report  (exact shingle-join oracle quadratic at twin
#       density; scale record stands at sf1)
#   project_prune          (120M rows of pure compare-vehicle cost on a
#       column-pruned scan; scale record stands at sf1)
set -u
cd "$(dirname "$0")/.."
export ORACLE_DUCK_MEM_GB=40
export PYSPARK_SUBMIT_ARGS="--driver-memory 24g --conf spark.driver.maxResultSize=4g pyspark-shell"

KEYS=$(python - <<'EOF'
import sys
sys.path.insert(0, '.')
from tools.sweep_oracles import battery_keys
from data_engineering__spark.conformance import ORACLE
skip = {"minhash_recall_report", "project_prune"}
print("\n".join(k for k in battery_keys(ORACLE) if k not in skip))
EOF
)
echo "$KEYS" > /tmp/sf10_battery_keys.txt
total=$(echo "$KEYS" | wc -l)
echo "battery: $total keys, chunks of 60"

chunk=0
echo "$KEYS" | split -l 60 - /tmp/sf10_chunk_
for f in /tmp/sf10_chunk_*; do
  chunk=$((chunk+1))
  echo "=== chunk $chunk ($f) start $(date +%T) ==="
  # shellcheck disable=SC2046
  python tools/sweep_oracles.py --sf /tmp/sf10 --digest \
      --master "local[12]" \
      --timings "/tmp/sf10_timings_chunk${chunk}.json" \
      $(cat "$f") 2>&1 | grep -Ev "WARN|INFO|Stage [0-9]" | tail -n 20
  echo "=== chunk $chunk done $(date +%T) ==="
done
echo "ALL CHUNKS DONE $(date +%T)"
