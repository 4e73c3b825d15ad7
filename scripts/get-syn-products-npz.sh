#!/usr/bin/env bash
# syn-products in SparseGraph npz format (for the sparsegraph dataset plugin).
exec "$(dirname "${BASH_SOURCE[0]}")/fetch_dataset.sh" url \
  https://public-files.jiongzhu.net/syn-products-npz.tar.gz \
  archives/syn-products-npz.tar.gz f1500ce1b342c361897230249cf41ebc26f3d1df09e89118c5f691eecd16262e
