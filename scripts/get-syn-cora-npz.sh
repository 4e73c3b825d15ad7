#!/usr/bin/env bash
# syn-cora in SparseGraph npz format (for the sparsegraph dataset plugin).
exec "$(dirname "${BASH_SOURCE[0]}")/fetch_dataset.sh" url \
  https://public-files.jiongzhu.net/syn-cora-npz.tar.gz \
  archives/syn-cora-npz.tar.gz 7609527ece3dbc3eadb84350754404a37d5fc6b2dc3ff74f0e4fda3922fb28fa
