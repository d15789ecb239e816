#!/bin/sh
# Pending TPU measurements, priority-ordered (run when the tunnel is back).
# Each step bounded so a flaky tunnel still yields the early data.
cd "$(dirname "$0")/.."
echo "=== 1. headline bench ==="
timeout 1200 python bench.py
echo "=== 2. stage breakdown (+ decimate A/B, pose) ==="
timeout 2400 python scripts/bench_breakdown.py preproc proposals detect pose front full proposals_nodecim detect_nodecim
echo "=== 3. preproc ablation (debug modes + frames_per_step sweep) ==="
timeout 1800 python scripts/bench_preproc_ablate.py
echo "=== 4. detect+track engine (auction association + bf16) ==="
timeout 1800 python scripts/bench_track.py
