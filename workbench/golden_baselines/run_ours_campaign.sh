#!/bin/bash
# Our framework's side of the baseline parity grid — same hyperparameters
# and seeds as run_reference_campaign.sh.  Logs to logs/ours/.
# Usage: ./run_ours_campaign.sh [gcn|mixhop|graphsage|gat|all]
set -u
cd "$(dirname "$0")"
mkdir -p logs/ours
GROUP="${1:-all}"
SEEDS="${SEEDS:-123 1 2 3 42}"
DATA=/root/reference/baselines/mixhop/data/planetoid/data
CLI="python -m h2gcn_tpu.run_experiments"
export PYTHONPATH=/root/repo

run() {
  local log="logs/ours/$1.log"; shift
  if [ -s "$log" ] && grep -q "DONE_OK" "$log"; then
    echo "skip $log (done)"; return 0
  fi
  echo "=== $log"
  if timeout 3600 "$@" > "$log" 2>&1; then
    echo "DONE_OK" >> "$log"
  else
    echo "DONE_FAIL rc=$?" >> "$log"
  fi
}

if [ "$GROUP" = gcn ] || [ "$GROUP" = all ]; then
  for ds in cora citeseer; do
    for v in gcn cheby mlp concat2 cheby_concat2; do
      for s in $SEEDS; do
        run "ours_${v}_${ds}_s${s}" \
          $CLI GCN planetoid --dataset "ind.$ds" --dataset_path "$DATA" \
            --platform cpu --variant "$v" --random_seed "$s"
      done
    done
  done
fi

if [ "$GROUP" = mixhop ] || [ "$GROUP" = all ]; then
  for s in $SEEDS; do
    run "ours_mixhop_cora_s${s}" \
      $CLI MIXHOP planetoid --dataset ind.cora --dataset_path "$DATA" \
        --platform cpu --random_seed "$s" --epochs 400 \
        --adj_pows 0:24:0,1:18:7,2:18:7 --learn_rate 1 \
        --lr_decrement_every 40 --early_stop_steps 200 \
        --input_dropout 0.5 --layer_dropout 0.9 --l2reg 5e-3
    run "ours_mixhop_citeseer_s${s}" \
      $CLI MIXHOP planetoid --dataset ind.citeseer --dataset_path "$DATA" \
        --platform cpu --random_seed "$s" --epochs 400 \
        --adj_pows 0:20:6,1:20:6,2:20:6 --learn_rate 0.25 \
        --lr_decrement_every 40 --early_stop_steps 200 \
        --input_dropout 0.5 --layer_dropout 0.9 --l2reg 5e-2
  done
fi

if [ "$GROUP" = graphsage ] || [ "$GROUP" = all ]; then
  for ds in cora citeseer; do
    for mc in SupervisedGraphSage SupervisedGraphSageConcat; do
      for s in $SEEDS; do
        run "ours_graphsage_${mc}_${ds}_s${s}" \
          $CLI GRAPHSAGE planetoid --dataset "ind.$ds" --dataset_path "$DATA" \
            --platform cpu --random_seed "$s" --epochs 100 --model_class "$mc"
      done
    done
  done
fi

if [ "$GROUP" = gat ] || [ "$GROUP" = all ]; then
  for ds in cora citeseer; do
    for s in $SEEDS; do
      run "ours_gat_${ds}_s${s}" \
        $CLI GAT planetoid --dataset "ind.$ds" --dataset_path "$DATA" \
          --platform cpu --random_seed "$s" --epochs 1500
    done
  done
fi
echo "campaign complete"
