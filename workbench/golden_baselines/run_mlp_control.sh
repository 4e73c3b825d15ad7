#!/bin/bash
# Controlled MLP/citeseer experiment: early stopping disabled, fixed 200
# epochs — isolates model parity from the knife-edge stop-time noise the
# default protocol amplifies on this config.
set -u
cd "$(dirname "$0")"
mkdir -p logs/mlpctl
export PYTHONPATH=/root/repo
DATA=/root/reference/baselines/mixhop/data/planetoid/data
run() {
  local log="logs/mlpctl/$1.log"; shift
  if [ -s "$log" ] && grep -q "DONE_OK" "$log"; then echo skip; return 0; fi
  echo "=== $log"
  if timeout 1200 "$@" > "$log" 2>&1; then echo "DONE_OK" >> "$log"; else echo "DONE_FAIL rc=$?" >> "$log"; fi
}
for s in 123 1 2 3 42 7 8 9 10 11; do
  run "ref_dense_citeseer_s${s}" \
    python run_gcn_reference.py --model dense --dataset ind.citeseer \
      --seed "$s" --epochs 200 --early_stopping 99999
  run "ours_mlp_citeseer_s${s}" \
    python -m h2gcn_tpu.run_experiments GCN planetoid --dataset ind.citeseer \
      --dataset_path "$DATA" --platform cpu --variant mlp --random_seed "$s" \
      --epochs 200 --early_stopping 0
done
echo mlp control complete
