#!/bin/sh
# Re-run the samples affected by fixes landed while the full census was
# running, then merge the deltas into census_r5.json (tools/merge_census.py
# recomputes the counts).  Usage: sh tools/rerun_merge.sh /tmp/rerun_list.txt
set -u
LIST="${1:-/tmp/rerun_list.txt}"
i=0
while IFS= read -r s; do
    [ -z "$s" ] && continue
    i=$((i+1))
    out="/tmp/delta_$i.json"
    timeout 900 python tools/run_census.py --only "$s" --out "$out" \
        >> /tmp/rerun_merge.log 2>&1
done < "$LIST"
cp census_r5.json census.json
python tools/merge_census.py /tmp/delta_*.json
cp census.json census_r5.json
