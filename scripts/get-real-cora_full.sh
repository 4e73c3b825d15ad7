#!/usr/bin/env bash
# cora_full benchmark.
exec "$(dirname "${BASH_SOURCE[0]}")/fetch_dataset.sh" gdrive \
  1Up5203lIPR1t_38RZTVuCtc28yBmd1VS archives/real-cora_full.tar.gz \
  b04a3db58aee34ddec4e24970665a3ef094125f39e2051c6e5024f124caa5053
