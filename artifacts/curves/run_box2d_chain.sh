#!/bin/bash
# Box2D seeds 3-9 for the n>=10 ref-parity experiment (VERDICT r2 item 4).
# One at a time to leave a core free for interactive work.
cd /root/repo
for s in 3 4 5 6 7 8 9; do
  PALLAS_AXON_POOL_IPS= PYTHONPATH=/root/repo:$PYTHONPATH \
    python examples/engine_curve_compare.py \
      --engine box2d --seed $s --episodes 4000 \
      --out artifacts/curves/curve_box2d_s${s}.jsonl \
      > artifacts/curves/log_box2d_s${s}.txt 2>&1
  echo "seed $s done rc=$?" >> artifacts/curves/box2d_chain_status.txt
done
echo "ALL DONE" >> artifacts/curves/box2d_chain_status.txt
