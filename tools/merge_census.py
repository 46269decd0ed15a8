#!/usr/bin/env python
"""Merge a partial census run (--out delta.json) into census.json,
recomputing the counts.  Usage: python tools/merge_census.py delta.json"""
import json
import sys

base = json.load(open("census.json"))
for fn in sys.argv[1:]:
    delta = json.load(open(fn))
    base["results"].update(delta["results"])
counts = {}
for v in base["results"].values():
    counts[v["status"]] = counts.get(v["status"], 0) + 1
base["counts"] = counts
json.dump(base, open("census.json", "w"), indent=1)
print(counts)
