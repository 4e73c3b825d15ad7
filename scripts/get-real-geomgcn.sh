#!/usr/bin/env bash
# GeomGCN real-world benchmarks (texas/wisconsin/cornell/chameleon/...).
exec "$(dirname "${BASH_SOURCE[0]}")/fetch_dataset.sh" gdrive \
  1g9Vv0YZZqSsFROOhSOiXvHMfWfM7oMWj archives/real-geomgcn.tar.gz \
  06bf9a52cb272b3b25227530eafc2a40681fa7c548641ec00ca2427812fbe39f
