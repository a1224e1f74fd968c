#!/bin/bash
# Round-5 artifact chain: run the TPU harnesses sequentially, logging to /tmp.
# Each step is bounded; failures don't stop the chain (retry manually).
cd /root/repo
log=/tmp/r5_chain.log
echo "=== r5 chain start $(date) ===" >> "$log"

run() {
  name=$1; shift
  echo "--- $name start $(date) ---" >> "$log"
  "$@" >> "$log" 2>&1
  echo "--- $name exit=$? $(date) ---" >> "$log"
}

run kparity  timeout 1200 python scripts/tpu_kernel_parity.py --out KPARITY_r05.json
run fidelity timeout 5400 python scripts/trajectory_fidelity.py --out FIDELITY_r05.json
run e2e_s0   timeout 5400 python scripts/e2e_accuracy.py --seed 0 --out E2EACC_r05.json
run e2e_s1   timeout 5400 python scripts/e2e_accuracy.py --seed 1 --out E2EACC_r05_seed1.json
run e2e_s2   timeout 5400 python scripts/e2e_accuracy.py --seed 2 --out E2EACC_r05_seed2.json
echo "=== r5 chain done $(date) ===" >> "$log"
