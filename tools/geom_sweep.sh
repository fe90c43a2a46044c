#!/bin/bash
# Fused-conv geometry sweep: window-DMA amplification = WINDOW/BLOCK.
# Each combo re-execs python (the constants are module-level). ~2-8 min
# compile per NEW combo through the tunnel; cached reruns are seconds.

cd "$(dirname "$0")/.."
for BW in "256 2048" "256 2048 v" "512 2048" "512 2048 v" "512 1024" "1024 2048" "256 1024"; do
  set -- $BW
  VW=""

  echo "=== GCDLSS_FUSED_BLOCK=$1 GCDLSS_FUSED_WINDOW=$2 $VW ==="
  timeout 4200 env GCDLSS_FUSED_BLOCK=$1 GCDLSS_FUSED_WINDOW=$2 $VW \
    python tools/geom_once.py
  echo "rc=$?"
done
