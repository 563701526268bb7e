#!/bin/bash
# Round-5 A/B: per_source vs span association on the worst deficit days,
# from cached sweeps, with the per-stage USGS ledger. Runs after the sweep
# regeneration pass; also dumps the backend-exact x_query cache first.
set -u
R=$(cd "$(dirname "$0")/.." && pwd)
RUN=$R/projects/NC_EHZ/run6

python -u "$R/scripts/nc_xquery_dump.py" 10000

for day in 2017_278 2017_279; do
  for mode in span per_source; do
    echo "=== $day $mode $(date -u +%H:%M:%S)"
    timeout 2400 python -u "$R/scripts/nc_process.py" --run "$RUN" \
      --days $day --thresh 0.25 --n-grids 1 --half --cache-sweep \
      --assoc-mode $mode --trace-usgs \
      --json-out "$RUN/ab_${day}_${mode}.json"
  done
done
echo "=== A/B done $(date -u +%H:%M:%S)"
