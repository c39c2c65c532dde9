#!/usr/bin/env bash
# Downsample every sequence's events.h5 to events_2x.h5
# (reference: scripts/downsample_all_events.sh)
set -euo pipefail
ROOT=${1:?usage: downsample_all_events.sh <dsec_root>}
find "$ROOT" -path "*/events/left/events.h5" | while read -r f; do
    out="$(dirname "$f")/events_2x.h5"
    if [ -e "$out" ]; then
        echo "skip $out (exists)"
        continue
    fi
    echo "downsampling $f -> $out"
    python "$(dirname "$0")/downsample_events.py" \
        --input_path "$f" --output_path "$out"
done
