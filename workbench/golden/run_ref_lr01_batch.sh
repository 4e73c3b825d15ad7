#!/bin/bash
# Reference trainings at the PUBLISHED lr (0.01, restored by the
# run_reference_train.py alias fix) for the apples-to-apples table.
# 800-epoch budget: at lr 0.01 every best-val epoch lands <150 across all
# 32 lr-0.01 "ours" runs, so 800 leaves 5x headroom while keeping each
# TF run ~10 min instead of ~25.
set -u
cd "$(dirname "$0")"
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p ref_lr01

run_one() {
  local ds=$1 net=$2 tag=$3 seed=$4
  local out="ref_lr01/ref_${tag}_s${seed}.log"
  if grep -q "Best performance" "$out" 2>/dev/null; then return; fi
  # unique --run_id: parallel same-second starts otherwise collide on the
  # reference's timestamp-named checkpoint dir (logger.py:20-21,38-41)
  timeout 2400 python run_reference_train.py H2GCN planetoid \
    --dataset "$ds" \
    --dataset_path /root/reference/baselines/mixhop/data/planetoid/data \
    --network_setup "$net" --random_seed "$seed" --epochs 800 \
    --run_id "r3_${tag}_s${seed}" \
    > "$out" 2>&1
  echo "done ref-lr01 $tag s$seed"
}

# 20 shared seeds (round 3: CI half-width < 0.3 needs n >= 20 at the
# observed per-seed stds — VERDICT r2 item 5)
for seed in 1 2 3 4 5 7 42 123 6 8 9 10 11 12 13 14 15 16 17 19; do
  for cfg in \
    "ind.cora:M64-R-T1-G-V-T2-G-V-C1-C2-D0.5-MO:h2gcn2_cora" \
    "ind.cora:M64-R-T1-G-V-C1-D0.5-MO:h2gcn1_cora" \
    "ind.citeseer:M64-R-T1-G-V-T2-G-V-C1-C2-D0.5-MO:h2gcn2_citeseer" \
    "ind.citeseer:M64-R-T1-G-V-C1-D0.5-MO:h2gcn1_citeseer"; do
    IFS=: read ds net tag <<< "$cfg"
    run_one "$ds" "$net" "$tag" "$seed" &
    while [ "$(jobs -r | wc -l)" -ge 2 ]; do wait -n; done
  done
done
wait
echo REF-LR01-DONE
