#!/bin/sh
# Tile/chunk/kmax sweep of the fused binned kernel on real TPU.
# Usage: nohup sh tools/sweep_fused.sh > /tmp/sweep.log 2>&1 &
cd "$(dirname "$0")/.."
for cfg in "32 128 64 24" "16 128 64 32" "32 128 32 24" "32 256 64 24"; do
  set -- $cfg
  echo "=== tile ${1}x${2} chunk $3 kmax $4 ==="
  PROF_TILE_H=$1 PROF_TILE_W=$2 PROF_CHUNK=$3 PROF_KMAX=$4 \
  PROF_STAGES=fused PROF_ITERS=8 python tools/profile_stages.py 2>&1 \
    | grep -v WARNING
done
echo "sweep done"
