#!/bin/bash
# Controlled cheby / cheby+JK experiment (VERDICT r3 task #6): the baseline
# campaign's unresolved corners — gcn_cheby/citeseer (-1.11) and
# gcn_cheby_concat_2/cora (+2.98 at sigma 4.3-5.7) — get the same treatment
# the MLP/citeseer outlier got: early stopping DISABLED, fixed 200 epochs,
# 10 shared seeds, isolating model parity from window-10 stop-time noise.
set -u
cd "$(dirname "$0")"
mkdir -p logs/chebyctl
export PYTHONPATH=/root/repo
DATA=/root/reference/baselines/mixhop/data/planetoid/data
run() {
  local log="logs/chebyctl/$1.log"; shift
  if [ -s "$log" ] && grep -q "DONE_OK" "$log"; then echo "skip $1"; return 0; fi
  echo "=== $log"
  if timeout 1800 "$@" > "$log" 2>&1; then echo "DONE_OK" >> "$log"; else echo "DONE_FAIL rc=$?" >> "$log"; fi
}
for s in 123 1 2 3 42 7 8 9 10 11; do
  for ds in cora citeseer; do
    run "ref_gcn_cheby_${ds}_s${s}" \
      python run_gcn_reference.py --model gcn_cheby --dataset "ind.$ds" \
        --seed "$s" --epochs 200 --early_stopping 99999
    run "ours_cheby_${ds}_s${s}" \
      python -m h2gcn_tpu.run_experiments GCN planetoid --dataset "ind.$ds" \
        --dataset_path "$DATA" --platform cpu --variant cheby \
        --random_seed "$s" --epochs 200 --early_stopping 0
    run "ref_cheby_jk_${ds}_s${s}" \
      python run_gcn_reference.py --model gcn_cheby_concat_2 \
        --dataset "ind.$ds" --seed "$s" --epochs 200 --early_stopping 99999
    run "ours_cheby_jk_${ds}_s${s}" \
      python -m h2gcn_tpu.run_experiments GCN planetoid --dataset "ind.$ds" \
        --dataset_path "$DATA" --platform cpu --variant cheby_concat2 \
        --random_seed "$s" --epochs 200 --early_stopping 0
  done
done
echo cheby control complete
