#!/usr/bin/env bash
# Shared sha256-verified dataset fetcher (capability match for the
# reference's per-dataset get-*.sh scripts). Usage:
#   fetch_dataset.sh <gdrive|url> <id-or-url> <target.tar.gz> <sha256>
set -euo pipefail
MODE="$1"; SRC="$2"; TARGET="$3"; SHA256SUM="$4"
cd "$(dirname "${BASH_SOURCE[0]}")/.."
mkdir -p "$(dirname "$TARGET")"
if [[ "$MODE" == "gdrive" ]]; then
    command -v gdown >/dev/null || pip install --upgrade gdown
    gdown -O "$TARGET" "$SRC"
else
    curl -L -o "$TARGET" "$SRC"
fi
echo "$SHA256SUM  $TARGET" | sha256sum -c
tar -xvzf "$TARGET"
