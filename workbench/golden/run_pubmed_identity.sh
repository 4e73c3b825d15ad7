#!/bin/bash
# Identity-features pubmed parity campaign (VERDICT r2 item 6 substitute):
# ind.pubmed.allx is unreconstructible in this container (proof:
# workbench/pubmed_reconstruction.py), so both frameworks train on the
# identity-features derivative (REAL pubmed graph/labels/split, features
# I[n]) with shared seeds — the reference-native protocol the syn-products
# cross-parity campaign used. 5 seeds x {H2GCN-2, H2GCN-1}, ours (JAX)
# and the EXECUTED reference TF2 trainer. Re-entrant. 500-epoch budget:
# best-val epochs land <150 at lr 0.01 on this dataset (smoke runs), and
# the full 2000-epoch default costs ~2h/run on 4 contended host CPUs.
set -u
cd "$(dirname "$0")"
export PYTHONPATH=/root/repo:/root/.axon_site
DATA=/root/repo/workbench/pubmed_identity_data
mkdir -p pubmed_identity /tmp/pub_ckpt

run_ours() {
  local net=$1 tag=$2 seed=$3
  local out="pubmed_identity/ours_${tag}_s${seed}.log"
  if grep -q "Best performance" "$out" 2>/dev/null; then return; fi
  ( timeout 2400 python -u -m h2gcn_tpu.run_experiments \
      H2GCN planetoid --platform cpu \
      --dataset ind.pubmed --dataset_path "$DATA" \
      --network_setup "$net" --random_seed "$seed" --sparse_features \
      --epochs 500 \
      --checkpoint_dir "/tmp/pub_ckpt/ours_s${seed}_${tag}" ) \
    > "$out" 2>&1
  echo "done pubmed ours $tag s$seed"
}

run_ref() {
  local net=$1 tag=$2 seed=$3
  local out="pubmed_identity/ref_${tag}_s${seed}.log"
  if grep -q "Best performance" "$out" 2>/dev/null; then return; fi
  timeout 4800 python run_reference_train.py H2GCN planetoid \
    --dataset ind.pubmed --dataset_path "$DATA" \
    --network_setup "$net" --random_seed "$seed" --epochs 800 \
    --run_id "pub_${tag}_s${seed}" \
    > "$out" 2>&1
  echo "done pubmed ref $tag s$seed"
}

for seed in 1 2 3 42 123 4 5 6 7 8 9 10 11 12 13; do
  for cfg in \
    "M64-R-T1-G-V-T2-G-V-C1-C2-D0.5-MO:h2gcn2" \
    "M64-R-T1-G-V-C1-D0.5-MO:h2gcn1"; do
    IFS=: read net tag <<< "$cfg"
    run_ours "$net" "$tag" "$seed"
    run_ref "$net" "$tag" "$seed"
  done
done
echo PUBMED-IDENTITY-DONE
