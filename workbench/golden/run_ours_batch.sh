#!/bin/bash
# "Ours" trainings for the apples-to-apples seed table in
# docs/BENCHMARKS.md: same protocol as the reference runs (2000 epochs,
# no early stopping, Adam @ published lr 0.01, best-val-acc selection),
# 8 seeds x {H2GCN-1,H2GCN-2} x {cora,citeseer}. Logs land in ours/ and
# are summarized by summarize_seeds.py. Re-entrant: completed logs
# (containing "Best performance") are skipped. Two jobs in parallel
# (4 host CPUs).
set -u
cd "$(dirname "$0")"
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p ours /tmp/ours_ckpt

run_one() {
  local ds=$1 net=$2 tag=$3 seed=$4
  local out="ours/ours_${tag}_s${seed}.log"
  if grep -q "Best performance" "$out" 2>/dev/null; then return; fi
  ( cd /root/repo && timeout 1200 python -u -m h2gcn_tpu.run_experiments \
      H2GCN planetoid --platform cpu \
      --dataset "$ds" \
      --dataset_path /root/reference/baselines/mixhop/data/planetoid/data \
      --network_setup "$net" --random_seed "$seed" \
      --checkpoint_dir "/tmp/ours_ckpt/ka_ours_s${seed}_${tag}" ) \
    > "$out" 2>&1
  echo "done ours $tag s$seed"
}

# 20 shared seeds (round 3, matching run_ref_lr01_batch.sh)
for seed in 123 42 7 1 2 3 4 5 6 8 9 10 11 12 13 14 15 16 17 19; do
  for cfg in \
    "ind.cora:M64-R-T1-G-V-T2-G-V-C1-C2-D0.5-MO:h2gcn2_cora" \
    "ind.cora:M64-R-T1-G-V-C1-D0.5-MO:h2gcn1_cora" \
    "ind.citeseer:M64-R-T1-G-V-T2-G-V-C1-C2-D0.5-MO:h2gcn2_citeseer" \
    "ind.citeseer:M64-R-T1-G-V-C1-D0.5-MO:h2gcn1_citeseer"; do
    IFS=: read ds net tag <<< "$cfg"
    run_one "$ds" "$net" "$tag" "$seed" &
    while [ "$(jobs -r | wc -l)" -ge 1 ]; do wait -n; done
  done
done
wait
echo OURS-BATCH-DONE
