#!/bin/sh
# Pending TPU measurements, priority-ordered (run when the tunnel is back).
# Each step bounded so a flaky tunnel still yields the early data.
cd "$(dirname "$0")/.."
echo "=== 1. headline bench ==="
timeout 1200 python bench.py
echo "=== 2. stage breakdown (+ decimate A/B) ==="
timeout 1800 python scripts/bench_breakdown.py preproc proposals detect front full proposals_nodecim detect_nodecim
echo "=== 3. preproc ablation ==="
timeout 1800 python scripts/bench_preproc_ablate.py
echo "=== 4. detect+track engine ==="
timeout 1800 python scripts/bench_track.py
