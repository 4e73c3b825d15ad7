#!/bin/bash
# Extra seeds for the high-variance GCN-family configs (dense/MLP and the
# two concat2 variants) so the parity table's noisy rows get 10+ seeds.
set -u
cd "$(dirname "$0")"
mkdir -p logs/ref logs/ours
export PYTHONPATH=/root/repo
DATA=/root/reference/baselines/mixhop/data/planetoid/data
declare -A V=( [dense]=mlp [gcn_concat_2]=concat2 [gcn_cheby_concat_2]=cheby_concat2 )
run() {
  local log="$1"; shift
  if [ -s "$log" ] && grep -q "DONE_OK" "$log"; then echo "skip $log"; return 0; fi
  echo "=== $log"
  if timeout 1800 "$@" > "$log" 2>&1; then echo "DONE_OK" >> "$log"; else echo "DONE_FAIL rc=$?" >> "$log"; fi
}
for ds in cora citeseer; do
  for m in dense gcn_concat_2 gcn_cheby_concat_2; do
    for s in 7 8 9 10 11; do
      run "logs/ref/ref_${m}_${ds}_s${s}.log" \
        python run_gcn_reference.py --model "$m" --dataset "ind.$ds" --seed "$s"
      run "logs/ours/ours_${V[$m]}_${ds}_s${s}.log" \
        python -m h2gcn_tpu.run_experiments GCN planetoid --dataset "ind.$ds" \
          --dataset_path "$DATA" --platform cpu --variant "${V[$m]}" --random_seed "$s"
    done
  done
done
echo extra seeds complete
