#!/bin/bash
# In-model Pallas kernel tuning sweeps, measured by the tunnel-proof
# bench (two-point while_loop slope — see bench.py docstring).  Isolated
# microbenches DISAGREE with in-model ordering on this rig; always tune
# through the full model.
#
# Usage: tools/tune_kernels.sh [mlp|flash|ab]
cd "$(dirname "$0")/.."
set -u

mlp() {
  for cfg in "512 4" "256 4" "128 4" "256 8" "256 2" "1024 4"; do
    set -- $cfg
    echo "=== MLP BLOCK_ROWS=$1 F_CHUNKS=$2 ==="
    VDN_MLP_BLOCK_ROWS=$1 VDN_MLP_F_CHUNKS=$2 \
      timeout 1200 python bench.py 2>&1 | grep -E '^\{'
  done
}

flash() {
  for bq in 256 384 512 704 1024; do
    echo "=== FLASH BLOCK_Q=$bq ==="
    VDN_FLASH_BLOCK_Q=$bq timeout 1200 python bench.py 2>&1 | grep -E '^\{'
  done
}

ab() {
  echo "=== fused MLP ON (default) ==="
  timeout 1200 python bench.py 2>&1 | grep -E '^\{'
  echo "=== fused MLP OFF (XLA tail) ==="
  VDN_DISABLE_FUSED_MLP=1 timeout 1200 python bench.py 2>&1 | grep -E '^\{'
}

"${1:-mlp}"
