#!/bin/bash
# Cross-framework syn-cora parity: the SAME generated graphs (this
# framework's pipeline, syncora_gen.json → /tmp/syncora_x), trained by BOTH
# the reference TF2 H2GCN (its own run_experiments.py via
# workbench/golden/run_reference_train.py, keras lr alias restored) and by
# this framework, shared seeds and protocol (H2GCN-2, 400 epochs,
# sliding-mean early stopping 40).  Logs to logs/syncora/.
set -u
cd "$(dirname "$0")"
mkdir -p logs/syncora
SEEDS="${SEEDS:-1 2}"
export PYTHONPATH=/root/repo

run() {
  local log="logs/syncora/$1.log"; shift
  if [ -s "$log" ] && grep -q "DONE_OK" "$log"; then
    echo "skip $log"; return 0
  fi
  echo "=== $log"
  if timeout 1800 "$@" > "$log" 2>&1; then
    echo "DONE_OK" >> "$log"
  else
    echo "DONE_FAIL rc=$?" >> "$log"
  fi
}

for ti in $(find /tmp/syncora_x -name "*.test.index"); do
  dir=$(dirname "$ti")
  name=$(basename "$ti" .test.index)
  vs=$(python -c "import json;print(json.load(open('$dir/job_document.json'))['val_size'])")
  short=$(echo "$name" | sed 's/mixhop-n1490-//; s/-c5//; s/-sample-cora_row-0.25p__0.5p//')
  for s in $SEEDS; do
    run "ref_${short}_s${s}" \
      python /root/repo/workbench/golden/run_reference_train.py H2GCN planetoid \
        --dataset "$name" --dataset_path "$dir" --val_size "$vs" \
        --network_setup M64-R-T1-G-V-T2-G-V-C1-C2-D0.5-MO --adj_nhood 1 2 \
        --epochs 400 --early_stopping 40 --random_seed "$s"
    run "ours_${short}_s${s}" \
      python -m h2gcn_tpu.run_experiments H2GCN planetoid --platform cpu \
        --dataset "$name" --dataset_path "$dir" --val_size "$vs" \
        --network_setup M64-R-T1-G-V-T2-G-V-C1-C2-D0.5-MO --adj_nhood 1 2 \
        --epochs 400 --early_stopping 40 --random_seed "$s"
  done
done
echo "syncora crossparity complete"
