#!/bin/bash
# Execute the reference baselines (via the compat wrappers) across the
# parity seed/dataset grid.  Logs to logs/ref/<model>_<ds>_s<seed>.log.
# Usage: ./run_reference_campaign.sh [gcn|mixhop|graphsage|gat|all]
set -u
cd "$(dirname "$0")"
mkdir -p logs/ref
GROUP="${1:-all}"
SEEDS="${SEEDS:-123 1 2 3 42}"

run() { # run <logname> <cmd...>
  local log="logs/ref/$1.log"; shift
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
    for m in gcn gcn_cheby dense gcn_concat_2 gcn_cheby_concat_2; do
      for s in $SEEDS; do
        run "ref_${m}_${ds}_s${s}" \
          python run_gcn_reference.py --model "$m" --dataset "ind.$ds" --seed "$s"
      done
    done
  done
fi

if [ "$GROUP" = mixhop ] || [ "$GROUP" = all ]; then
  # hyperparams = the reference's own train_cora.sh / train_citeseer.sh
  for s in $SEEDS; do
    run "ref_mixhop_cora_s${s}" \
      python run_mixhop_reference.py --seed "$s" --run_id "s${s}" --retrain \
        --dataset_name=ind.cora --adj_pows=0:24:0,1:18:7,2:18:7 \
        --learn_rate=1 --lr_decrement_every=40 --early_stop_steps=200 \
        --input_dropout=0.5 --layer_dropout=0.9 --l2reg=5e-3
    run "ref_mixhop_citeseer_s${s}" \
      python run_mixhop_reference.py --seed "$s" --run_id "s${s}" --retrain \
        --dataset_name=ind.citeseer --adj_pows=0:20:6,1:20:6,2:20:6 \
        --learn_rate=0.25 --lr_decrement_every=40 --early_stop_steps=200 \
        --input_dropout=0.5 --layer_dropout=0.9 --l2reg=5e-2
  done
fi

if [ "$GROUP" = graphsage ] || [ "$GROUP" = all ]; then
  for ds in cora citeseer; do
    for mc in SupervisedGraphSage SupervisedGraphSageConcat; do
      for s in $SEEDS; do
        run "ref_graphsage_${mc}_${ds}_s${s}" \
          python run_graphsage_reference.py --seed "$s" --dataset "ind.$ds" \
            --model_class "$mc"
      done
    done
  done
fi

if [ "$GROUP" = gat ] || [ "$GROUP" = all ]; then
  for ds in cora citeseer; do
    for s in $SEEDS; do
      run "ref_gat_${ds}_s${s}" \
        python run_gat_reference.py --seed "$s" --dataset "ind.$ds" \
          --checkpt_file "ckpt_${ds}_s${s}/mod.ckpt"
    done
  done
fi
echo "campaign complete"
